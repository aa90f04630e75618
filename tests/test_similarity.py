

def test_scalar_quantize_reconstruction(spark):
    from chewdata_spark.operators.similarity import scalar_quantize
    from pyspark.sql import functions as F

    vecs = [(i, [float(i % 7) - 3.0, float(i) / 50.0, 1.5]) for i in range(100)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    codes = scalar_quantize(df, "vec_id", "embedding")
    assert codes.count() == 300
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= -128 and rng[1] <= 127
    # constant dimension (index 2) collapses to -128 everywhere
    assert codes.filter("dim = 2").select("code").distinct().collect()[0][0] == -128
    # dequantized values reconstruct within half a quantization step
    stats = (
        df.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    joined = (
        codes.join(stats, "dim")
        .join(df.select("vec_id", F.posexplode("embedding").alias("dim", "x")),
              ["vec_id", "dim"])
        .filter("mx != mn")
        .withColumn("deq", (F.col("code") + 128) / 255 * (F.col("mx") - F.col("mn")) + F.col("mn"))
        .withColumn("err", F.abs(F.col("deq") - F.col("x")))
        .withColumn("step", (F.col("mx") - F.col("mn")) / 255)
    )
    assert joined.filter(F.col("err") > F.col("step") * 0.51).count() == 0


def test_pq_codes_pick_nearest_subspace_centroid(spark):
    import numpy as np
    from chewdata_spark.operators.similarity import pq_codes

    rng = np.random.default_rng(42)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_codes(df, m=4, centroid_stride=10)
    got = {(r["vec_id"], r["subspace"]): r["code"] for r in out.collect()}
    assert len(got) == 60 * 4
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    cids = sorted(i for i, _ in rows if i % 10 == 0)
    for (vid, j), code in got.items():
        v = vecs[vid][j * 4 : (j + 1) * 4]
        dists = {c: round(float(((vecs[c][j * 4 : (j + 1) * 4] - v) ** 2).sum()), 6) for c in cids}
        best = min(dists.values())
        # the chosen code achieves the minimum, lowest cid on ties
        assert dists[code] == best
        assert code == min(c for c, d in dists.items() if d == best)
    # determinism
    again = {(r["vec_id"], r["subspace"]): r["code"] for r in out.collect()}
    assert got == again


def test_matryoshka_topk_recall_vs_exact(spark, sf_dir):
    """The prefix-dim coarse filter must keep >= 0.9 recall@10 vs the
    exact brute-force top-k, and the scores it reports must be the
    EXACT full-dim cosine (the re-rank never reports coarse scores)."""
    from chewdata_spark.queries.similarity_queries import (
        ann_matryoshka_topk,
        cosine_topk,
    )

    exact = {}
    for r in cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.qid, set()).add(r.vec_id)
    approx = {}
    sims = {}
    for r in ann_matryoshka_topk(spark, sf_dir).collect():
        approx.setdefault(r.qid, set()).add(r.vec_id)
        sims[(r.qid, r.vec_id)] = r.sim
    assert exact.keys() == approx.keys()
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.9, f"recall {hits}/{total}"
    # reported sims equal the exact twin's sims on shared pairs
    exact_sims = {
        (r.qid, r.vec_id): r.sim for r in cosine_topk(spark, sf_dir).collect()
    }
    for key in set(sims) & set(exact_sims):
        assert sims[key] == exact_sims[key], key


def test_matryoshka_ivf_recall_vs_exact_and_ivf(spark, sf_dir):
    """The composed IVF x matryoshka retrieval keeps >= 0.5 recall@10
    vs brute force on this worst-case corpus (random embeddings: the
    prefix is an untrained random projection AND the stride centroids
    are arbitrary), loses almost nothing vs IVF alone (the coarse
    stage's extra loss is bounded), and reports EXACT full-dim sims."""
    from chewdata_spark.queries.similarity_queries import (
        ann_ivf_topk,
        ann_matryoshka_ivf_topk,
        cosine_topk,
    )

    exact = {}
    for r in cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.qid, set()).add(r.vec_id)
    exact_sims = {
        (r.qid, r.vec_id): r.sim for r in cosine_topk(spark, sf_dir).collect()
    }
    composed = {}
    sims = {}
    for r in ann_matryoshka_ivf_topk(spark, sf_dir).collect():
        composed.setdefault(r.qid, set()).add(r.vec_id)
        sims[(r.qid, r.vec_id)] = r.sim
    ivf = {}
    for r in ann_ivf_topk(spark, sf_dir).collect():
        ivf.setdefault(r.qid, set()).add(r.vec_id)
    total = sum(len(exact[q]) for q in exact)
    rec_composed = sum(len(exact[q] & composed.get(q, set())) for q in exact) / total
    rec_ivf = sum(len(exact[q] & ivf.get(q, set())) for q in exact) / total
    assert rec_composed >= 0.5, rec_composed
    # the coarse stage may cost a little recall on top of the probe's
    # own loss, but never more than 0.1 at candidates=100
    assert rec_composed >= rec_ivf - 0.1, (rec_composed, rec_ivf)
    for key in set(sims) & set(exact_sims):
        assert sims[key] == exact_sims[key], key
