"""Corpus tokenization: frequency vocabulary + token-id sequences.

The step between raw text and training batches: build a top-K term
vocabulary from the corpus, then map every document to its ordered
token-id sequence (OOV → unk id).  Composes with
``curation.pack_sequences`` for the full corpus → packed-sequence
pipeline.

Scale shapes:
- vocabulary: one term-keyed aggregation with map-side partials; the
  top-K cut runs as TakeOrdered (per-partition heaps); the id-assigning
  row_number window runs over the ALREADY-CUT K rows — a single
  partition of K, never of the full term space.
- tokenization: position-carrying explode (map-side) + broadcast vocab
  join + one doc-keyed aggregation; sequence order is restored with
  ``array_sort`` over (pos, id) structs and a field extraction — no
  interpreted higher-order lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.operators.text import _tokens


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "term"),
    )


def build_vocab(df: DataFrame, text_col: str, *, top_k: int = 1000) -> DataFrame:
    """Top-K corpus vocabulary ``(term, tid, term_n)`` with dense ids
    0..K-1 assigned by count desc, term asc (deterministic ties)."""
    counts = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_n"))
        .orderBy(F.col("term_n").desc(), F.col("term").asc())
        .limit(top_k)
    )
    # unpartitioned window is bounded: it runs AFTER .limit(top_k), so
    # the single partition holds ≤ top_k rows regardless of corpus size
    w = Window.orderBy(F.col("term_n").desc(), F.col("term").asc())
    return counts.select(
        "term", (F.row_number().over(w) - 1).cast("int").alias("tid"), "term_n"
    )


def tokenize_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    unk_id: int,
) -> DataFrame:
    """Per document: ``(doc_id, n_tokens, token_ids)`` where token_ids
    is the document's terms mapped through ``vocab`` in text order,
    out-of-vocabulary terms mapped to ``unk_id``."""
    toks = _token_rows(df, id_col, text_col)
    mapped = toks.join(F.broadcast(vocab.select("term", "tid")), "term", "left").select(
        "doc_id", "pos", F.coalesce("tid", F.lit(unk_id)).cast("int").alias("tid")
    )
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("s"),
        )
        .select("doc_id", "n_tokens", F.col("s").getField("tid").alias("token_ids"))
    )


def zipf_fit(df: DataFrame, text_col: str, *, top_n: int = 10000) -> DataFrame:
    """Zipf-law diagnostic: OLS fit of ln(frequency) on ln(rank) over
    the top-``top_n`` vocabulary — the standard sanity check that a
    scraped corpus has natural-language token statistics (slope ≈ -1)
    rather than generated/boilerplate text.

    Reuses :func:`build_vocab`: the global ordering is bounded by
    TakeOrdered to ``top_n`` rows before any single-partition work, so
    the fit costs one vocab aggregation regardless of corpus size.
    Returns one row ``(n_terms, slope, intercept, r2)``.
    """
    v = build_vocab(df, text_col, top_k=top_n)
    lr, lf = F.log(F.col("tid") + 1), F.log("term_n")
    return v.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )
