"""Behavior tests for the round-5 additions: portable (md5) hash-family
dedup twins, logprob quality gate, Zipf fit, train/val/test split and
hard-negative mining — properties the oracle parity check can't see
(recall vs exact, fraction bounds, statistical sanity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chewdata_spark.operators import curation, dedup, similarity, tokenize
from chewdata_spark.tables import load_table

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF01, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF01, "embeddings").cache()


def test_portable_minhash_recall_vs_exact(spark, docs):
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_candidate_pairs(
            dedup.minhash_signatures_portable(
                docs, "doc_id", "text", num_perm=32, shingle_size=3
            ),
            num_perm=32,
            bands=16,
            jaccard_threshold=0.5,
        ).collect()
    }
    assert exact, "no planted near-dup pairs at sf0.01?"
    recall = len(exact & lsh) / len(exact)
    # 32 perms / 16 bands (r=2): ~99% candidate recall at j=0.5
    assert recall >= 0.9, f"portable LSH recall {recall:.2f} < 0.9"
    # verified pairs are a subset of the exact pair set (no false accepts)
    assert lsh <= exact


def test_portable_simhash_finds_exact_duplicates(spark):
    # identical texts must land at hamming 0; a one-word edit stays close
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(1, base), (2, base), (3, base.replace("river", "ocean")),
            (4, "completely different words about spark catalyst tungsten shuffles")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = dedup.simhash_portable(df, "doc_id", "text")
    pairs = dedup.simhash_candidate_pairs(fps, bands=4, max_hamming=2, bits=32)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((1, 2)) == 0


def test_simhash_portable_fingerprint_fits_32_bits(spark, docs):
    fps = dedup.simhash_portable(docs.limit(50), "doc_id", "text")
    row = fps.agg(F.max("simhash").alias("mx"), F.min("simhash").alias("mn")).first()
    assert 0 <= row.mn and row.mx < (1 << 32)


def test_lines_within_doc_removes_only_intra_doc_repeats(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon one\nunique line here with words\nalpha beta gamma delta epsilon one"),
        (2, "alpha beta gamma delta epsilon one"),  # same line, other doc: kept
        (3, "short\nshort\nlong enough line with five words"),  # short dup kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dedup.dedup_lines_within_doc(df, "doc_id", "text").collect()
    }
    assert out[1].n_dropped == 1
    assert out[1].clean_text.count("alpha beta") == 1
    assert out[2].n_dropped == 0  # cross-doc copy untouched
    assert out[3].n_dropped == 0  # short lines exempt
    assert out[3].clean_text.count("short") == 2


def test_filter_by_logprob_drops_the_requested_fraction(spark, docs):
    scored = curation.unigram_logprob(docs, "doc_id", "text")
    n_total = scored.count()
    kept = curation.filter_by_logprob(docs, "doc_id", "text", drop_frac=0.1)
    n_kept = kept.count()
    assert n_kept < n_total
    # quantile threshold with >= keeps 90% +/- ties
    assert abs(n_kept - 0.9 * n_total) <= max(5, 0.02 * n_total)


def test_train_val_test_split_fractions_and_determinism(spark, docs):
    out = curation.train_val_test_split(docs, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n > 0.85
    # deterministic: same assignment on recompute
    again = curation.train_val_test_split(docs, "doc_id")
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )


def test_zipf_fit_slope_is_negative_and_r2_sane(spark, docs):
    row = tokenize.zipf_fit(docs, "text", top_n=10000).first()
    # the synthetic corpus has a tiny template vocabulary — the fit
    # still must see every term, slope downward, and bound r2
    assert row.n_terms > 20
    assert row.slope < 0, "Zipf slope must be negative"
    assert 0.0 <= row.r2 <= 1.0


def test_hard_negatives_exclude_same_label_and_self(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.hard_negative_topk(emb, queries, k=5)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in out.collect():
        assert r.vec_id != r.qid
        assert labels[r.vec_id] != labels[r.qid]
    # k rows per query, ranked 1..k
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.qid, []).append(r.rank)
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_countmin_overestimates_never_under(spark, docs):
    # CMS guarantee: min over rows of the term's counters >= true count
    import hashlib

    from chewdata_spark.queries.tokenize_queries import countmin_sketch_terms

    cells = {
        (r.sketch_row, r.col): r.cnt
        for r in countmin_sketch_terms(spark, SF01).collect()
    }
    toks = (
        docs.selectExpr("explode(split(trim(lower(text)), '\\\\s+')) AS term")
        .groupBy("term")
        .count()
        .collect()
    )
    true_counts = {r.term: r["count"] for r in toks}
    for term in list(true_counts)[:30]:
        est = min(
            cells.get(
                (j, int(hashlib.md5(f"{j}|{term}".encode()).hexdigest()[:4], 16) % 256),
                0,
            )
            for j in range(4)
        )
        assert est >= true_counts[term], term


def test_skyline_equals_brute_force_and_prunes(spark):
    # grid pruning must be LOSSLESS (same skyline as the O(n^2) brute
    # force over all points) and EFFECTIVE (candidates are a small
    # fraction of the corpus)
    from chewdata_spark.queries.analytics import parts_skyline
    from chewdata_spark.tables import load_table

    pts = [
        (r.p_partkey, float(r.p_retailprice), int(r.p_size))
        for r in load_table(spark, SF01, "part").collect()
    ]
    brute = {
        k
        for k, pr, sz in pts
        if not any(
            (pr2 <= pr and sz2 <= sz and (pr2 < pr or sz2 < sz))
            for _, pr2, sz2 in pts
        )
    }
    got = {r.p_partkey for r in parts_skyline(spark, SF01).collect()}
    assert got == brute
    assert 0 < len(got) < len(pts) * 0.02
