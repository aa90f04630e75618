"""Recall of the sub-quadratic (scale-path) dedup/ANN variants vs their
exact counterparts, plus blocking-invariance of the exact GEMM."""

from __future__ import annotations

import pytest

from chewdata_spark.operators import dedup, similarity
from chewdata_spark.tables import load_table

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF01, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF01, "embeddings").cache()


def test_minhash_lsh_recall_vs_exact(spark, docs):
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_candidate_pairs(
            dedup.minhash_signatures(docs, "doc_id", "text", num_perm=64, shingle_size=3),
            num_perm=64,
            bands=16,
            jaccard_threshold=0.5,
        ).collect()
    }
    assert exact, "no planted near-dup pairs at sf0.01?"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 ({len(exact)} exact pairs)"


def test_clean_corpus_lsh_recall(spark, docs):
    """The benched clean-corpus path (LSH pair source) must drop almost
    every doc the exact path drops."""
    from chewdata_spark.queries.dedup_queries import dedup_clean_corpus, dedup_clean_corpus_lsh

    keep_exact = {r.doc_id for r in dedup_clean_corpus(spark, SF01).collect()}
    keep_lsh = {r.doc_id for r in dedup_clean_corpus_lsh(spark, SF01).collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    dropped_exact = all_ids - keep_exact
    dropped_lsh = all_ids - keep_lsh
    assert dropped_exact, "exact path dropped nothing at sf0.01?"
    recall = len(dropped_exact & dropped_lsh) / len(dropped_exact)
    assert recall >= 0.9, f"clean-corpus LSH drop recall {recall:.2f} < 0.9"
    # LSH must not over-drop wildly either (candidates are verified)
    assert len(dropped_lsh - dropped_exact) <= max(2, len(dropped_exact) // 5)


def test_ivf_topk_recall_vs_exact(spark, emb):
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.qid, r.vec_id)
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in similarity.ivf_topk(emb, queries, k=10, centroid_stride=50, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} < 0.6"


def test_clustered_near_dup_recall_vs_exact(spark, emb):
    """The benched sub-quadratic near-dup path (IVF blocking, multi-probe,
    per-cluster GEMM verify) must recover ≥0.9 of the exact GEMM's pairs,
    with no false positives (every candidate is exactly verified).
    Same stride/nprobe as the benched query (0.996 recall at sf0.1)."""
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.near_dup_pairs_exact(emb, threshold=0.4).collect()
    }
    clustered = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.4, centroid_stride=100, nprobe=6
        ).collect()
    }
    recall = len(exact & clustered) / len(exact)
    assert recall >= 0.9, f"clustered near-dup recall {recall:.2f} < 0.9"
    assert not clustered - exact  # exact verify → zero false positives


def test_blocked_gemm_invariant_to_num_blocks(spark, emb):
    """Exactness: the distributed blocked GEMM must produce identical
    pairs for any blocking factor (each unordered pair in exactly one
    block-pair group)."""
    a = sorted(
        (r.id_a, r.id_b, r.sim)
        for r in similarity.near_dup_pairs_exact(emb, threshold=0.4, num_blocks=16).collect()
    )
    b = sorted(
        (r.id_a, r.id_b, r.sim)
        for r in similarity.near_dup_pairs_exact(emb, threshold=0.4, num_blocks=3).collect()
    )
    assert a == b and len(a) > 0


def test_clean_corpus_lsh_cc_recall(spark, docs):
    """The LSH→connected-components→anti-join production path keeps
    nearly the same survivor set as the exact-pair cluster twin."""
    from chewdata_spark.queries.dedup_queries import (
        dedup_clean_corpus_cc,
        dedup_clean_corpus_lsh_cc,
    )

    exact = {r.doc_id for r in dedup_clean_corpus_cc(spark, SF01).collect()}
    lsh = {r.doc_id for r in dedup_clean_corpus_lsh_cc(spark, SF01).collect()}
    assert exact
    agree = len(exact & lsh) / len(exact | lsh)
    assert agree >= 0.95, f"survivor-set agreement {agree:.2f} < 0.95"


def test_srp_topk_recall_vs_exact(spark, emb):
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.qid, r.vec_id)
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in similarity.srp_topk(emb, queries, k=10, n_bits=120, band_bits=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"SRP-LSH recall {recall:.2f} < 0.6"
    # determinism: seeded projections give the identical candidate set
    again = {
        (r.qid, r.vec_id)
        for r in similarity.srp_topk(emb, queries, k=10, n_bits=120, band_bits=5).collect()
    }
    assert approx == again


def test_lsh_recall_survives_realistic_bucket_cap(spark, docs):
    """Planted near-dups must survive a production hot-bucket cap: with
    max_bucket far below the corpus size but above real near-dup group
    sizes, the capped candidate set keeps >=0.9 recall vs exact."""
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_candidate_pairs(
            dedup.minhash_signatures(docs, "doc_id", "text", num_perm=64, shingle_size=3),
            num_perm=64,
            bands=16,
            jaccard_threshold=0.5,
            max_bucket=50,
        ).collect()
    }
    assert exact, "no planted near-dup pairs at sf0.01?"
    recall = len(exact & capped) / len(exact)
    assert recall >= 0.9, f"capped LSH recall {recall:.2f} < 0.9"


def test_hot_bucket_cap_drops_degenerate_buckets(spark):
    """A boilerplate bucket larger than max_bucket is dropped (its
    quadratic pair explode never runs); distinct near-dup groups under
    the cap still pair up."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(30)]
    rows += [(100, "a unique document about distributed query engines"),
             (101, "a unique document about distributed query engine")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = dedup.minhash_signatures(df, "doc_id", "text", num_perm=64, shingle_size=3)
    uncapped = dedup.minhash_candidate_pairs(
        sigs, num_perm=64, bands=16, jaccard_threshold=0.5, max_bucket=None
    ).collect()
    capped = dedup.minhash_candidate_pairs(
        sigs, num_perm=64, bands=16, jaccard_threshold=0.5, max_bucket=10
    ).collect()
    uncapped_pairs = {(r.id_a, r.id_b) for r in uncapped}
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert (0, 1) in uncapped_pairs and len(uncapped_pairs) > 400
    # the 30-member boilerplate bucket exceeds the cap -> dropped
    assert all(a >= 100 for a, _ in capped_pairs), capped_pairs
    # the small near-dup group survives the cap
    assert (100, 101) in capped_pairs


def test_simhash_bits_misfit_raises(spark):
    """A 32-bit portable fingerprint banded with the default bits=64
    must fail loudly (it would silently one-bucket the corpus)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    fps = dedup.simhash_portable(df, "doc_id", "text")
    ok = dedup.simhash_candidate_pairs(fps, bands=4, max_hamming=8, bits=32)
    ok.collect()  # correct bits: runs
    bad = dedup.simhash_candidate_pairs(fps, bands=4, max_hamming=8, bits=16)
    with pytest.raises(Exception, match="simhash fingerprint exceeds bits"):
        bad.collect()


def test_simhash_default_bits_with_portable_fp_raises(spark):
    """The classic trap: 32-bit simhash_portable fingerprints banded
    with the DEFAULT bits=64 must fail loudly at plan construction
    (the top bands would be constant zero -> one bucket)."""
    rows = [(i, f"document number {i} about engines and data") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = dedup.simhash_portable(df, "doc_id", "text")
    with pytest.raises(ValueError, match="overstates the hash family's width"):
        dedup.simhash_candidate_pairs(fps, bands=4, max_hamming=3)  # bits=64 default


def test_contamination_probe_cap_drops_hot_train_buckets(spark):
    """A degenerate train-side boilerplate bucket larger than max_bucket
    is dropped from the contamination probe (no unbounded
    |bench∩bucket|×|train∩bucket| explode), while a genuinely
    contaminated bench/train pair with distinct text survives the cap."""
    from chewdata_spark.queries.dedup_queries import contamination_ranked

    leaked = "the quick brown fox jumps over the lazy dog near the river bank"
    bench = spark.createDataFrame(
        [(0, leaked), (97, "completely unrelated benchmark question text here")],
        ["doc_id", "text"],
    )
    train = [(i, "identical boilerplate navigation footer text repeated") for i in range(1, 31)]
    train += [(50, leaked + " today")]
    train_df = spark.createDataFrame(train, ["doc_id", "text"])

    uncapped = contamination_ranked(bench, train_df, max_bucket=None).collect()
    capped = contamination_ranked(bench, train_df, max_bucket=10).collect()
    capped_pairs = {(r.bench_id, r.train_id) for r in capped}
    # the planted contamination survives the cap...
    assert (0, 50) in capped_pairs, capped_pairs
    # ...and no boilerplate train doc (a 30-row hot bucket > cap) can
    # pair with anything once capped
    assert all(t == 50 for _, t in capped_pairs), capped_pairs
    # sanity: the uncapped run also finds the planted pair
    assert (0, 50) in {(r.bench_id, r.train_id) for r in uncapped}


def test_two_sided_signatures_multichar_tags(spark):
    """Ids must come back exactly under multi-character side tags (the
    split-back strips by tag length, not a hardcoded offset)."""
    a = spark.createDataFrame([(1, "alpha beta gamma delta")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "epsilon zeta eta theta")], ["doc_id", "text"])
    sa, sb = dedup.two_sided_signatures(
        a, b, "doc_id", "text", portable=True, num_perm=8, tags=("new", "seen")
    )
    assert [r.id for r in sa.collect()] == [1]
    assert [r.id for r in sb.collect()] == [2]
    assert dict(sa.dtypes)["id"] == "bigint"


def test_simhash_degenerate_corpus_does_not_false_positive(spark):
    """A duplicate-dominated corpus yields a CORRELATED width-probe
    sample (few distinct fingerprints); the probe must not mislabel a
    correctly-specified family as too narrow."""
    rows = [(i, "the very same duplicated document text") for i in range(64)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = dedup.simhash_portable(df, "doc_id", "text")
    # bits=32 is the CORRECT width for simhash_portable — must not raise
    out = dedup.simhash_candidate_pairs(fps, bands=2, max_hamming=1, bits=32)
    assert out.count() > 0


def test_ivfpq_topk_recall_vs_exact_l2(spark, emb):
    """IVF-PQ's ADC ranks by approximate L2, so its ground truth is the
    exact L2 top-k over the SAME probed universe the routing allows.
    Against the full exact L2 top-10 (no routing, raw floats) the
    compressed index must still recover a solid fraction — the
    PQ-distortion + routing loss stays bounded on this corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    queries = emb.filter(F.col("vec_id") < 5)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = queries.select(
        F.col("vec_id").alias("qid"), F.col("embedding").cast("array<double>").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact = {
        (r.qid, r.vec_id)
        for r in q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d2", F.round(d2, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in similarity.ivfpq_topk(
            emb, queries, k=10, m=8, centroid_stride=50, nprobe=4, rerank=100
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 0.64 observed; routing (4/~80 clusters probed, cosine routing vs
    # L2 truth) caps at 0.68 on this near-random corpus — the refine
    # stage recovers nearly all PQ coding loss
    assert recall >= 0.55, f"IVF-PQ refined recall {recall:.2f} < 0.55"


def test_jaccard_prefix_exact_equality(spark, docs):
    """PPJoin prefix filtering is EXACT — bit-identical pair set and
    jaccard values vs the quadratic inverted-index twin at sf0.01."""
    quad = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect())
    )
    ppj = sorted(
        map(tuple, dedup.jaccard_prefix_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect())
    )
    assert quad, "no planted near-dup pairs at sf0.01?"
    assert ppj == quad


def test_jaccard_prefix_prunes_hot_shingles(spark):
    """The candidate join must key only on PREFIX tokens: a boilerplate
    shingle shared by hundreds of docs ranks last by global df and stays
    out of every prefix — so the naive inverted-index join's k-doc hot
    bucket (k^2/2 join rows) collapses, while the output stays EXACT."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from chewdata_spark.operators.dedup import _shingle_rows

    # 300 docs, each: 6 unique words + the same 3-word footer.  Every
    # doc shares the footer shingle "all rights reserved" -> naive join
    # hot bucket = 300 (44850 candidate pairs); true near-dup pairs: 0.
    rows = [
        (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f all rights reserved")
        for i in range(300)
    ]
    boiler = spark.createDataFrame(rows, ["doc_id", "text"])

    sh = (
        _shingle_rows(boiler, "doc_id", "text", 3)
        .dropDuplicates(["id", "s"])
        .select("id", F.xxhash64("s").alias("sh"))
    )
    freq = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("sh")))
    ranked = freq.withColumn(
        "rk", F.row_number().over(Window.partitionBy("id").orderBy("df", "sh"))
    ).withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    prefix = ranked.filter(
        F.col("rk") <= F.col("n_sh") - F.ceil(0.5 * F.col("n_sh")) + 1
    )
    naive_hot = sh.groupBy("sh").count().agg(F.max("count")).collect()[0][0]
    prefix_hot = prefix.groupBy("sh").count().agg(F.max("count")).collect()[0][0]
    assert naive_hot == 300
    # every doc's prefix is its 4 rarest shingles — all doc-unique here,
    # so the shared boilerplate shingles never enter any prefix.
    assert prefix_hot == 1, (prefix_hot, naive_hot)
    # and the exact result on this corpus is the empty set, both paths
    assert dedup.jaccard_prefix_pairs(boiler, "doc_id", "text", n=3, threshold=0.5).count() == 0
