"""Distributed suffix-array construction (prefix doubling) and the
longest-repeated-substring report — the suffix-array half of Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better"
(public; their exact-substring dedup builds a corpus suffix array).

The repo's k-gram span path (operators/dedup.py::duplicate_spans) already
marks POSITIONS covered by a duplicated fixed-length window — for
span-cutting, length-L-gram duplication is exactly Lee et al.'s
"duplicated substring of length >= L" criterion.  What k-grams cannot
answer is the *whole-substring* question: a k-gram island can be a
chimera (every window duplicated against a different partner, the whole
span never repeated).  The suffix array answers it exactly: the longest
repeated substring is the maximum LCP of two suffixes adjacent in
suffix order.

Spark-first design (no concatenated corpus string, no driver-side sort):

1. position grain — every ``(doc_id, off)`` suffix of each doc's text
   (capped at ``max_chars``); suffixes never materialize as strings
   until the final, tiny LCP step;
2. prefix doubling — after round k every position carries the rank of
   its first ``2^k`` characters; round k+1 ranks the pair
   ``(rank[p], rank[p + 2^k])`` (0 = past-end, sorting before all real
   ranks, so a shorter suffix precedes its extensions — the suffix-array
   convention).  ``ceil(log2(max_chars))`` rounds, each one bounded
   shuffle set;
3. global DENSE rank of the pair keys without a single-reducer window
   and without a sampling range partitioner: a deterministic
   order-preserving bucket derived from the previous round's max rank,
   per-bucket ``dense_rank``, plus cumulative distinct-key offsets from
   a #buckets-sized broadcast — the order-preserving sibling of
   curation._bucketed_rank's hash-keyed prefix sum (see
   ``_dense_rank_bucketed`` for why RangePartitioner is unusable here);
4. early exit when every rank is unique (all suffixes distinguished),
   with an eager localCheckpoint per round exactly like
   graph.connected_components — bench.py's LogicalRDD detection rebuilds
   the loop inside the timed window;
5. adjacent-suffix LCP — final dense ranks are consecutive integers, so
   "adjacent in suffix order" is an equi-join on ``rank+1`` (never a
   global LAG window); the LCP itself is one ``aggregate()`` cursor over
   at most ``max_chars`` characters of the two (re-fetched) texts.

Scale: position count = ``max_chars``-capped chars per doc × docs; every
stage is a keyed shuffle or a bounded window; the driver sees only the
per-round uniqueness flag and the final top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dense_rank_bucketed(
    df: DataFrame, k_prev: int, *, n_parts: int = 32
) -> DataFrame:
    """Add ``_rank``: the global 1-based DENSE rank of ``(rank, nxt)``
    without an unpartitioned window or a sampling-based range
    partitioner (RangePartitioner samples per execution, and the two
    consumers below would each re-execute it — nondeterministic
    boundaries corrupt the offsets).  The bucket is DERIVED from the
    data instead: ``rank`` is dense in ``1..k_prev`` from the previous
    round, so ``_pid = (rank-1)·n_parts div k_prev`` is deterministic,
    order-preserving (keys in bucket b all sort before bucket b+1 —
    equal ranks share a bucket), and balanced in KEY space.  Dense-rank
    inside each bucket, then shift by the cumulative count of DISTINCT
    keys in preceding buckets (a ≤``n_parts``-row broadcast).

    Row-space skew: one hot rank (a very common ``2^k``-prefix) makes
    one bucket's window large; the population of any rank shrinks
    geometrically as ``h`` doubles, so the skew is worst in round 1 and
    self-heals — the same profile every distributed prefix-doubling SA
    has (Flick & Aluru, SC'15)."""
    bucketed = df.withColumn(
        "_pid",
        F.floor((F.col("rank") - 1) * n_parts / F.lit(k_prev)).cast("int"),
    )
    local = F.dense_rank().over(
        Window.partitionBy("_pid").orderBy("rank", "nxt")
    )
    ranked = bucketed.withColumn("_r", local)
    ndv = (
        bucketed.groupBy("_pid", "rank", "nxt")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = ndv.select(
        "_pid", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn("_rank", (F.col("_off") + F.col("_r")).cast("bigint"))
        .drop("_pid", "_r", "_off")
    )


def suffix_ranks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_chars: int = 256,
) -> DataFrame:
    """(doc_id, off, rank): the corpus suffix array as a rank relation —
    ``rank`` is the 1-based position of suffix ``text[off:]`` in the
    sorted order of ALL suffixes (dense: identical suffixes share a
    rank).  Prefix doubling with an eager per-round localCheckpoint."""
    docs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.substring(F.col(text_col), 1, max_chars).alias("t"),
        )
        .filter(F.length("t") > 0)
    )
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("t"), "(?!^)")).alias("off0", "ch"),
        )
        # a zero-width regex also matches at end-of-string, yielding one
        # trailing '' element — drop it, it is not a position
        .filter(F.col("ch") != "")
        .select("doc_id", (F.col("off0") + 1).alias("off"), "ch")
    )
    # round 0: rank = dense rank of the single character (charset is
    # bounded, so the distinct-char window is tiny by construction)
    chars = pos.select("ch").distinct()
    char_rank = chars.withColumn(
        "_crank",
        F.dense_rank().over(Window.orderBy("ch")).cast("bigint"),
    )
    r = pos.join(F.broadcast(char_rank), "ch").select(
        "doc_id", "off", F.col("_crank").alias("rank")
    )
    r = r.localCheckpoint()
    n_pos, k = r.agg(F.count(F.lit(1)), F.max("rank")).first()

    h = 1
    while h < max_chars and k < n_pos:
        nxt = r.select(
            "doc_id", (F.col("off") - h).alias("off"), F.col("rank").alias("nxt")
        ).filter(F.col("off") >= 1)
        paired = (
            r.join(nxt, ["doc_id", "off"], "left")
            .withColumn("nxt", F.coalesce("nxt", F.lit(0)))
        )
        r = (
            _dense_rank_bucketed(paired, int(k))
            .select("doc_id", "off", F.col("_rank").alias("rank"))
            .localCheckpoint()
        )
        h *= 2
        # k == n_pos -> every suffix distinguished, ranks are final
        k = r.agg(F.max("rank")).first()[0]
    return r


def longest_repeated_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_chars: int = 256,
    min_len: int = 10,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` longest substrings (within the first ``max_chars``
    chars of each doc) that occur at least twice in the corpus —
    ``(substring, length)`` ordered by (length desc, substring asc).

    Every repeated substring is a prefix of two suffixes adjacent in
    suffix order, so the candidates are exactly the adjacent-pair LCPs
    plus the duplicated-suffix groups (rank multiplicity >= 2, LCP =
    whole suffix).  Adjacency is an equi-join on ``rank + 1`` (dense
    ranks are consecutive); the LCP is one bounded ``aggregate()``
    cursor per adjacent pair."""
    ranks = suffix_ranks(df, id_col, text_col, max_chars=max_chars)
    docs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.substring(F.col(text_col), 1, max_chars).alias("t"),
        )
        .filter(F.length("t") > 0)
    )
    # one representative (doc, off) per rank + the group's multiplicity
    rep = ranks.groupBy("rank").agg(
        F.min(F.struct("doc_id", "off")).alias("p"),
        F.count(F.lit(1)).alias("m"),
    )
    suf = (
        rep.select("rank", "m", F.col("p.doc_id").alias("doc_id"),
                   F.col("p.off").alias("off"))
        .join(docs, "doc_id")
        .select(
            "rank", "m",
            F.expr("substring(t, off, {0})".format(max_chars)).alias("suf"),
        )
    )
    nxt = suf.select((F.col("rank") - 1).alias("rank"), F.col("suf").alias("suf2"))
    lcp_expr = F.expr(
        """
        aggregate(
          sequence(1, least(length(suf), length(suf2))),
          named_struct('n', 0, 'go', true),
          (acc, i) -> if(acc.go and substring(suf, i, 1) = substring(suf2, i, 1),
                         named_struct('n', acc.n + 1, 'go', true),
                         named_struct('n', acc.n, 'go', false))
        ).n
        """
    )
    adjacent = (
        suf.join(nxt, "rank")
        .select(lcp_expr.alias("lcp"), "suf")
        .select(F.expr("substring(suf, 1, lcp)").alias("substring"),
                F.col("lcp").alias("length"))
    )
    dup_groups = suf.filter(F.col("m") >= 2).select(
        F.col("suf").alias("substring"), F.length("suf").alias("length")
    )
    return (
        adjacent.unionByName(dup_groups)
        .filter(F.col("length") >= min_len)
        .dropDuplicates(["substring"])
        .orderBy(F.col("length").desc(), F.col("substring").asc())
        .limit(top_n)
    )


def repeat_spans_sa(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_chars: int = 256,
    min_len: int = 10,
) -> DataFrame:
    """Per-document merged char spans covered by a WHOLE substring of
    length >= ``min_len`` that occurs at least twice in the corpus —
    Lee et al. 2022's exact-substring dedup mark, computed from the
    suffix array (the k-gram span path marks k-gram islands, which may
    be chimeric; this marks true whole-substring repeats).

    Identity used on both engines: the longest repeated prefix of a
    suffix equals the max of its LCPs with its two NEIGHBOURS in suffix
    order (identical suffixes — rank multiplicity >= 2 — repeat whole).
    Per-position dup lengths are therefore one rank-group join; spans
    merge with the standard gaps-and-islands cumulative-max window per
    doc (bounded by the doc's own positions).

    Returns ``(doc_id, span_start, span_end)`` — 1-based, end
    inclusive, within the first ``max_chars`` chars of each doc.
    """
    ranks = suffix_ranks(df, id_col, text_col, max_chars=max_chars)
    docs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.substring(F.col(text_col), 1, max_chars).alias("t"),
        )
        .filter(F.length("t") > 0)
    )
    rep = ranks.groupBy("rank").agg(
        F.min(F.struct("doc_id", "off")).alias("p"),
        F.count(F.lit(1)).alias("m"),
    )
    suf = (
        rep.select("rank", "m", F.col("p.doc_id").alias("doc_id"),
                   F.col("p.off").alias("off"))
        .join(docs, "doc_id")
        .select(
            "rank", "m",
            F.expr(f"substring(t, off, {max_chars})").alias("suf"),
        )
    )
    nxt = suf.select((F.col("rank") - 1).alias("rank"), F.col("suf").alias("suf2"))
    lcp_expr = F.expr(
        """
        aggregate(
          sequence(1, least(length(suf), length(suf2))),
          named_struct('n', 0, 'go', true),
          (acc, i) -> if(acc.go and substring(suf, i, 1) = substring(suf2, i, 1),
                         named_struct('n', acc.n + 1, 'go', true),
                         named_struct('n', acc.n, 'go', false))
        ).n
        """
    )
    # lcp with the NEXT group; a group's lcp with the PREVIOUS group is
    # the previous group's l_next — one more rank-shift join
    l_next = (
        suf.join(nxt, "rank", "left")
        .select(
            "rank", "m", F.length("suf").alias("slen"),
            F.coalesce(lcp_expr, F.lit(0)).alias("l_next"),
        )
    )
    l_prev = l_next.select(
        (F.col("rank") + 1).alias("rank"), F.col("l_next").alias("l_prev")
    )
    dup = (
        l_next.join(l_prev, "rank", "left")
        .select(
            "rank",
            F.greatest(
                F.when(F.col("m") >= 2, F.col("slen")).otherwise(0),
                F.col("l_next"),
                F.coalesce("l_prev", F.lit(0)),
            ).alias("dup_len"),
        )
        .filter(F.col("dup_len") >= min_len)
    )
    marked = ranks.join(dup, "rank").select(
        "doc_id",
        F.col("off").alias("s"),
        (F.col("off") + F.col("dup_len") - 1).alias("e"),
    )
    # gaps-and-islands per doc: a new island starts where off exceeds
    # the running max end of all earlier spans
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = marked.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("s").cast("int").alias("span_start"),
            F.max("e").cast("int").alias("span_end"),
        )
        .drop("island")
    )
