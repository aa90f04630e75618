"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  set, compute dot products with ``zip_with``/``aggregate`` (JVM-side,
  no Python), rank with a window.  At 100 TB this is a single pass over
  the corpus per query batch — the correct baseline.
- :func:`ivf_topk` — IVF-style approximate search: deterministic
  coarse centroids, assign each vector to its nearest centroid (one
  broadcast + projection), probe only the ``nprobe`` closest clusters
  per query.  Scales the scan down by ~nclusters/nprobe.

Dot products run in double precision left-to-right so results are
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is broadcast (query batches are small); the corpus is
    scanned once; the per-query rank is a window over qid — the shuffle
    key is qid, so parallelism = number of queries x AQE coalescing.
    Output: (qid, vec_id, sim) — excludes self-matches.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


def assign_ivf_clusters(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantization.

    Centroids = vectors whose id % stride == 0 (deterministic, no
    k-means iterations — swap in k-means|| offline for production).
    Assignment = argmax cosine vs the broadcast centroid set, computed
    as one projection.  Returns (assigned_corpus, centroids).
    """
    centroids = corpus.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    assigned = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine(F.col("vec"), F.col("cvec")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "vec", F.col("cid").alias("cluster"))
    )
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    centroid_stride: int = 50,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest clusters.

    At scale, cluster the corpus once (write bucketed by cluster), then
    each query touches nprobe/nclusters of the data — here expressed as
    a semi-join from the probe list onto the clustered corpus.
    """
    assigned, centroids = assign_ivf_clusters(
        corpus, id_col=id_col, vec_col=vec_col, centroid_stride=centroid_stride
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine(F.col("qvec"), F.col("cvec")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("qid", "qvec", F.col("cid").alias("cluster"))
    )
    scored = (
        assigned.join(probes, "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


def near_dup_pairs_exact(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked matrix multiply.

    The full embedding matrix is broadcast (like a broadcast-join build
    side — N x d doubles; 1M x 64 ≈ 0.5 GB is the practical ceiling) and
    each partition computes its rows' similarities against all higher-id
    vectors with one BLAS matmul inside ``mapInPandas``.  This replaces
    ~N²/2 interpreted per-pair expression evaluations with vectorized
    kernels — orders of magnitude faster — and ships only matching pairs
    back through Arrow.  Beyond the build-side ceiling, block by IVF
    cluster first (:func:`embedding_near_dup_pairs`).
    """
    import numpy as np

    spark = corpus.sparkSession
    pdf = corpus.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def gen(batches):
        import pandas as pd

        b_ids, b_mat, b_norms = bc.value
        for part in batches:
            if len(part) == 0:
                continue
            vids = part[id_col].to_numpy()
            vecs = np.vstack(part[vec_col].to_numpy()).astype(np.float64)
            vnorms = np.sqrt((vecs * vecs).sum(axis=1))
            sims = (vecs @ b_mat.T) / np.outer(vnorms, b_norms)
            out_a: list = []
            out_b: list = []
            out_s: list = []
            for r in range(len(vids)):
                # slack below threshold; the authoritative rounded filter
                # is applied Spark-side so semantics match the SQL oracle
                mask = (b_ids > vids[r]) & (sims[r] >= threshold - 1e-9)
                out_a.extend([int(vids[r])] * int(mask.sum()))
                out_b.extend(b_ids[mask].tolist())
                out_s.extend(sims[r][mask].tolist())
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "sim_raw": out_s})

    raw = corpus.select(id_col, vec_col).mapInPandas(
        gen, "id_a bigint, id_b bigint, sim_raw double"
    )
    return (
        raw.withColumn("sim", F.round("sim_raw", 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    centroid_stride: int = 50,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, bucketed by IVF cluster.

    Pairs are only compared within a cluster (near-dups land in the
    same cluster with high probability) — the blocked version of the
    quadratic all-pairs scan.
    """
    assigned, _ = assign_ivf_clusters(corpus, id_col=id_col, vec_col=vec_col, centroid_stride=centroid_stride)
    a, b = assigned.alias("a"), assigned.alias("b")
    return (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
