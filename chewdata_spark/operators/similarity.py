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


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the ``k`` most-similar corpus vectors whose label DIFFERS
    from the query's — the examples a retrieval/embedding model most
    confuses, which is exactly what its next training batch needs.

    Same scale shape as :func:`cosine_topk`: the query batch is
    broadcast, the corpus is scanned once, and the label filter runs
    before the rank window so mined negatives never shuffle positives.
    Output: (qid, vec_id, sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("clabel"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("qid"))
            & (F.col("clabel") != F.col("qlabel"))
        )
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
    nprobe: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantization.

    Centroids = vectors whose id % stride == 0 (deterministic, no
    k-means iterations — swap in k-means|| offline for production).
    Assignment = top-``nprobe`` cosine vs the broadcast centroid set,
    computed as one projection (multi-probe assignment replicates each
    vector into its nprobe nearest clusters — the standard recall lever
    for cluster-blocked pair generation).  Returns (assigned_corpus,
    centroids); with nprobe>1 a vector appears once per probed cluster.
    """
    centroids = corpus.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    rows = centroids.collect()  # centroid set is small by contract (see below)
    renamed = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in renamed.schema.fields
    ) + ", cluster " + renamed.schema["vec_id"].dataType.simpleString()
    if not rows:
        return renamed.limit(0).withColumn("cluster", F.col("vec_id")), centroids
    import numpy as np

    cids = np.array([r.cid for r in rows])
    cmat = np.array([list(r.cvec) for r in rows], dtype=np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True) + 1e-300
    by_cid = np.argsort(cids)  # cid-ascending so a STABLE sort on -sim
    cids, cmat = cids[by_cid], cmat[by_cid]  # tie-breaks to the lower cid
    # Assignment = top-nprobe cosine vs the centroid matrix, computed as
    # a numpy GEMM per Arrow batch against the BROADCAST centroids —
    # zero shuffle (the naive form, crossJoin(N×C) + a window partitioned
    # by vec_id, shuffles and sorts N·C rows; the GEMM touches each
    # vector once).  The centroid set must fit in executor memory — the
    # standard IVF contract (C ≈ √N; at 100 TB train k-means|| offline
    # and cap C, don't derive it from a stride).
    bc = corpus.sparkSession.sparkContext.broadcast((cids, cmat))
    npr = nprobe

    def gen(batches):
        b_cids, b_cmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-300)
            # round to 6 dp before the argsort: numpy GEMM and a SQL
            # engine's sequential dot differ in the last ulp, and the
            # rounding collapses those near-ties so the (sim desc, cid
            # asc) pick is engine-portable (the SQL oracle does the same)
            sims = np.round(V @ b_cmat.T, 6)  # (batch, C)
            take = min(npr, sims.shape[1])
            # (sim desc, cid asc) — centroids are cid-sorted, so the
            # stable sort's tie-break matches the SQL window's ordering
            picked = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            out = pdf.iloc[np.repeat(np.arange(len(pdf)), take)].copy()
            out["cluster"] = b_cids[picked.ravel()]
            yield out

    return renamed.mapInPandas(gen, out_schema), centroids


def _ivf_probes(q, centroids, nprobe):
    """(qid, qvec, cluster): each query's top-``nprobe`` clusters by
    FULL-dimension cosine against the broadcast centroid set —
    deterministic (6-dp rounding, cid tie-break); shared by
    :func:`ivf_topk` and :func:`matryoshka_ivf_topk` so their oracles'
    determinism contract can never diverge."""
    return (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_psim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .withColumn(
            "_prb",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("_psim").desc(), F.col("cid").asc()
                )
            ),
        )
        .filter(F.col("_prb") <= nprobe)
        .select("qid", "qvec", F.col("cid").alias("cluster"))
    )


def _two_level_topc(
    scored, order_col: str, candidates: int, n_salts: int = 32
):
    """Lossless per-qid top-``candidates`` by ``(order_col desc,
    vec_id asc)`` WITHOUT a corpus-wide window: per-(qid, salt) top-C
    first, then top-C of the ``n_salts * candidates`` survivors —
    every global top-C row is top-C within its own salt.  ``scored``
    must carry qid and vec_id; extra columns ride along."""
    pre_w = Window.partitionBy("qid", "_salt").orderBy(
        F.col(order_col).desc(), F.col("vec_id").asc()
    )
    fin_w = Window.partitionBy("qid").orderBy(
        F.col(order_col).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("_salt", F.pmod(F.col("vec_id"), F.lit(n_salts)))
        .withColumn("_prk", F.row_number().over(pre_w))
        .filter(F.col("_prk") <= candidates)
        .withColumn("_crk", F.row_number().over(fin_w))
        .filter(F.col("_crk") <= candidates)
    )


def _rank_topk(exact, k: int):
    """Final exact-score top-``k`` per query: (qid, vec_id, sim, rank),
    (sim desc, vec_id asc) deterministic order."""
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


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
    scored = (
        assigned.join(_ivf_probes(q, centroids, nprobe), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
        )
    )
    return _rank_topk(scored, k)


def near_dup_pairs_exact(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    num_blocks: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via distributed blocked GEMM.

    Rows hash into ``num_blocks`` blocks; every unordered block pair
    (bi ≤ bj) is one ``applyInPandas`` group whose task GEMMs block bi
    against block bj (strict upper triangle when bi == bj) with one
    vectorized BLAS matmul.  Each unordered vector pair lands in exactly
    one group, so no dedup pass is needed.

    Scale shape: NOTHING is collected to the driver (the block-pair
    table is nb² metadata rows).  Each row is shuffled to ~nb groups
    (communication O(N·nb)); a task holds ≤ 2N/nb vectors.  Compute
    stays the unavoidable exact N²/2 — for sub-quadratic use
    :func:`embedding_near_dup_pairs` (cluster-blocked).

    ``num_blocks=None`` auto-sizes: the larger of the MEMORY bound
    (2N·d·8 bytes / ~256 MB per task — at N=10⁸, d=64 that's nb≈400)
    and a PARALLELISM floor (enough block pairs to feed ~¼ of the
    cores; GEMM tasks are BLAS-bound, so modest task counts amortize
    scheduling).  The byte estimate comes from Catalyst's plan
    statistics (free — no job); only if statistics are unavailable does
    it fall back to one count job.  Block sizing is a heuristic — a 2×
    size misestimate moves nb, not correctness.
    """
    spark = corpus.sparkSession
    nb = num_blocks
    if nb is None:
        import math

        try:
            # file-backed plans report real bytes (vectors dominate, so
            # bytes ≈ N·d·8); RDD-backed/derived plans report the
            # Long.MaxValue sentinel or join-multiplied garbage — treat
            # anything implausibly large (> 1 PiB) as unavailable
            size = int(
                corpus._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if size <= 0 or size > (1 << 50):
                raise ValueError("no usable size statistic")
        except Exception:
            first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
            d = int(first["d"]) if first and first["d"] else 64
            size = corpus.count() * d * 8
        mem_nb = math.ceil(size * 2 / (256 << 20))
        par = max(1, spark.sparkContext.defaultParallelism // 4)
        par_nb = math.ceil((math.sqrt(8 * par + 1) - 1) / 2)
        nb = min(1024, max(2, mem_nb, par_nb))
    pairs = spark.createDataFrame(
        [(i, j) for i in range(nb) for j in range(i, nb)], "bi int, bj int"
    )
    src = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("blk"),
    )
    tagged = src.join(
        F.broadcast(pairs), (F.col("blk") == F.col("bi")) | (F.col("blk") == F.col("bj"))
    )

    def gemm(key, pdf):
        import numpy as np
        import pandas as pd

        bi, bj = key
        empty = pd.DataFrame({"id_a": [], "id_b": [], "sim_raw": []}).astype(
            {"id_a": "int64", "id_b": "int64", "sim_raw": "float64"}
        )
        if bi == bj:
            a = b = pdf
        else:
            a = pdf[pdf["blk"] == bi]
            b = pdf[pdf["blk"] == bj]
        if len(a) == 0 or len(b) == 0:
            return empty
        aid = a["vid"].to_numpy()
        bid = b["vid"].to_numpy()
        A = np.vstack(a["vec"].to_numpy()).astype(np.float64)
        B = np.vstack(b["vec"].to_numpy()).astype(np.float64)
        an = np.sqrt((A * A).sum(axis=1))
        bn = np.sqrt((B * B).sum(axis=1))
        sims = (A @ B.T) / np.outer(an, bn)
        # slack below threshold; the authoritative rounded filter is
        # applied Spark-side so semantics match the SQL oracle
        hot = sims >= threshold - 1e-9
        if bi == bj:
            hot &= aid[:, None] < bid[None, :]  # upper triangle once
        r, c = np.nonzero(hot)
        ia, ib = aid[r], bid[c]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)  # cross-block order
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim_raw": sims[r, c]})

    raw = tagged.groupBy("bi", "bj").applyInPandas(
        gemm, "id_a bigint, id_b bigint, sim_raw double"
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
    nprobe: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, bucketed by IVF cluster.

    Pairs are only compared within a shared probed cluster — the
    sub-quadratic version of the all-pairs scan.  Multi-probe assignment
    (each vector lands in its ``nprobe`` nearest clusters) recovers the
    pairs that straddle a cluster boundary.

    Scale shape: ONE shuffle of N·nprobe (id, vec, cluster) rows keyed
    by cluster; each task GEMMs one cluster (≈ nprobe·stride vectors —
    bounded, BLAS-vectorized like the exact twin); only above-threshold
    (id, id, sim) triples reach the multi-probe dedup.  Compute is
    Σ cluster² ≈ N·nprobe²·stride — linear in N, vs the exact twin's
    N²/2.  A degenerate centroid set can still skew one cluster large;
    AQE skew handling or re-training centroids is the lever there.
    """
    assigned, _ = assign_ivf_clusters(
        corpus, id_col=id_col, vec_col=vec_col, centroid_stride=centroid_stride, nprobe=nprobe
    )

    def gemm(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"id_a": [], "id_b": [], "sim_raw": []}).astype(
            {"id_a": "int64", "id_b": "int64", "sim_raw": "float64"}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["vec_id"].to_numpy()
        V = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        n = np.sqrt((V * V).sum(axis=1))
        sims = (V @ V.T) / np.outer(n, n)
        # slack below threshold; the authoritative rounded filter is
        # applied Spark-side so semantics match the exact twin's
        hot = (sims >= threshold - 1e-9) & (ids[:, None] < ids[None, :])
        r, c = np.nonzero(hot)
        return pd.DataFrame({"id_a": ids[r], "id_b": ids[c], "sim_raw": sims[r, c]})

    raw = assigned.groupBy("cluster").applyInPandas(
        gemm, "id_a bigint, id_b bigint, sim_raw double"
    )
    return (
        raw.withColumn("sim", F.round("sim_raw", 6))
        .filter(F.col("sim") >= threshold)
        # a pair sharing k probed clusters appears k times with an
        # identical exact sim — only above-threshold (id,id,sim) triples
        # reach the dedup shuffle, never vectors
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "sim")
    )


def scalar_quantize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-dimension int8 scalar quantization (the standard ANN memory
    step: float32 vectors -> 4x smaller codes + a tiny codebook).

    Fully distributed: posexplode -> per-dimension global min/max
    (map-side partial agg over ``dim``, one tiny shuffle), then the
    dim-count-sized codebook broadcasts back over the exploded corpus —
    no driver collect, same shape as the IVF centroid table.  Codes:
    ``round((x - mn) / (mx - mn) * 255) - 128``; constant dimensions
    (mx == mn) quantize to -128.

    Output is long-form ``(id, dim, code)`` — schema-stable for any
    vector dimensionality and directly comparable across engines.
    """
    e = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    stats = e.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    code = F.when(F.col("mx") == F.col("mn"), F.lit(-128)).otherwise(
        (F.round((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255) - 128)
        .cast("int")
    )
    return (
        e.join(F.broadcast(stats), "dim")
        .select(F.col(id_col), "dim", code.cast("int").alias("code"))
    )


def srp_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 128,
    band_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Signed-random-projection signature (the embedding-space SimHash,
    Charikar STOC'02): bit j = sign(v · r_j) for a deterministic seeded
    Gaussian projection matrix.  Cosine-similar vectors agree on most
    bits, so banded chunks of the signature bucket near neighbors.
    ``band_bits`` sets the bucket selectivity: P(band match) =
    (1 - θ/π)^band_bits — narrow bands for recall, wide for precision.

    The projection matrix (n_bits × dim, a few KB) broadcasts; each
    Arrow batch does one numpy GEMM + sign + bit-pack — zero shuffle,
    zero collect of data (one `first()` row fixes dim).  Returns
    (vec_id, vec, sig: array<int> of band chunks).
    """
    import numpy as np

    first = df.select(vec_col).first()
    if first is None:
        # schema must mirror the non-empty path (input-derived types),
        # or downstream joins fail only on the empty case
        empty = df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
        ).withColumn("sig", F.array().cast("array<int>"))
        return empty.limit(0)
    dim = len(first[0])
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((n_bits, dim))
    bc = df.sparkSession.sparkContext.broadcast(proj)
    renamed = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in renamed.schema.fields
    ) + ", sig array<int>"
    n_chunks = n_bits // band_bits
    bb = band_bits

    def gen(batches):
        import numpy as _np

        P = bc.value
        weights = (1 << _np.arange(bb)).astype(_np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            bits = ((V @ P.T) >= 0).astype(_np.int64)  # (batch, n_bits)
            packed = bits.reshape(len(pdf), n_chunks, bb) @ weights  # vectorized pack
            pdf = pdf.copy()
            pdf["sig"] = [[int(v) for v in row] for row in packed]
            yield pdf

    return renamed.mapInPandas(gen, out_schema)


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 128,
    band_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via SRP-LSH bucketing: corpus and queries hash
    through the SAME projections; any query/corpus pair agreeing on at
    least one signature band becomes a candidate, verified with
    exact cosine and ranked per query.

    Scale shape: band explode (×n_bits/band_bits, map-side), ONE shuffle on
    (band, chunk); candidates dedup then join vectors back by id —
    never carried through the band explode.  Recall lever = more bands
    / narrower bands (vs nprobe for IVF); tested against the exact
    scan in tests/test_dedup_recall.py.
    """
    c_sigs = srp_signatures(
        corpus, id_col=id_col, vec_col=vec_col, n_bits=n_bits, band_bits=band_bits, seed=seed
    )
    q_sigs = srp_signatures(
        queries, id_col=id_col, vec_col=vec_col, n_bits=n_bits, band_bits=band_bits, seed=seed
    )

    def bands(df, idn):
        return df.select(
            F.col("vec_id").alias(idn),
            F.posexplode("sig").alias("band", "chunk"),
        )
    cand = (
        bands(q_sigs, "qid")
        .join(bands(c_sigs, "vec_id"), ["band", "chunk"])
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id")
        .distinct()
    )
    # vectors come back from the ORIGINAL inputs, not the signature
    # stage: mapInPandas subtrees have no exchange to reuse, so pulling
    # vec out of c_sigs/q_sigs would run the projection GEMM over the
    # whole corpus a second time per action
    c_vecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    q_vecs = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    scored = (
        cand.join(c_vecs, "vec_id")
        .join(F.broadcast(q_vecs), "qid")
        .select("qid", "vec_id", F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


def srp_sign_matrix_md5(n_bits: int, dim: int) -> list[list[float]]:
    """±1 sign-projection matrix derived from md5 — the portable hash
    family behind :func:`srp_topk_portable`.  Row j comes from
    ``md5(f"srp|{j}")``: sign(j, d) = +1 iff bit ``(3 - d % 4)`` of hex
    digit ``d // 4`` of the digest is set (the same digit/bit walk as
    ``simhash_portable``).  hashlib.md5 == Spark F.md5 == DuckDB md5,
    so an oracle re-derives the identical matrix in SQL.  One digest
    carries 128 bits, so ``dim`` must be ≤ 128."""
    import hashlib

    if dim > 128:
        raise ValueError(f"md5 sign rows carry 128 bits; dim={dim} > 128")
    out = []
    for j in range(n_bits):
        h = hashlib.md5(f"srp|{j}".encode()).hexdigest()
        out.append(
            [
                1.0 if (int(h[d // 4], 16) >> (3 - d % 4)) & 1 else -1.0
                for d in range(dim)
            ]
        )
    return out


def srp_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 10,
    n_bits: int = 32,
    band_bits: int = 8,
) -> DataFrame:
    """SRP-LSH top-k with the *portable* md5-derived ±1 projections
    (:func:`srp_sign_matrix_md5`) — the fully oracle-backed twin of
    :func:`srp_topk`, whose seeded Gaussian matrix a SQL engine cannot
    reproduce.  Every stage is bit-replayable in DuckDB: sign bits are
    sequential ``zip_with``/``aggregate`` folds (the PC1 dot-product
    device) rounded to 6 dp before the sign test, the 32-bit
    fingerprint bands into 4×8-bit buckets, query bands probe corpus
    bands on (band_idx, band_val), and exact cosine verifies + ranks
    the candidates — so the output is deterministic regardless of
    banding recall on the pairs found.

    Scale shape: the sign matrix is a literal (n_bits × dim floats,
    ~KB) compiled into the projection expressions — zero shuffle to
    fingerprint; ONE shuffle on (band_idx, band_val) for the probe;
    vectors join back by id only for the candidate set.  Verification
    twin: coarser than the 120-bit production variant (8-bit bands ≈
    1/256 bucket selectivity), priced beside it in the bench like
    every md5 twin.
    """
    signs = srp_sign_matrix_md5(n_bits, dim)
    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1

    def fingerprint(df: DataFrame, idn: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        fp = None
        for j in range(n_bits):
            sj = F.array(*[F.lit(s) for s in signs[j]])
            dot = F.aggregate(
                F.zip_with(v, sj, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            )
            bit = (
                F.when(F.round(dot, 6) >= 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            piece = F.shiftleft(bit, j)
            fp = piece if fp is None else fp.bitwiseOR(piece)
        return df.select(F.col(id_col).alias(idn), fp.alias("fp"))

    def bands(df: DataFrame, idn: str) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright("fp", b * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("band_val"),
                )
                for b in range(n_bands)
            ]
        )
        return df.select(F.col(idn), F.explode(arr).alias("band")).select(
            idn, "band.band_idx", "band.band_val"
        )

    cand = (
        bands(fingerprint(queries, "qid"), "qid")
        .join(bands(fingerprint(corpus, "vec_id"), "vec_id"), ["band_idx", "band_val"])
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id")
        .distinct()
    )
    c_vecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    q_vecs = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    scored = (
        cand.join(c_vecs, "vec_id")
        .join(F.broadcast(q_vecs), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


def pq_codes(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    centroid_stride: int = 50,
) -> DataFrame:
    """Product quantization (Jégou et al., PAMI'11): the vector splits
    into ``m`` subspaces and each subvector is coded as its nearest
    subspace centroid — m bytes per vector instead of 4·dim, the
    memory layout every billion-scale ANN index uses.

    Codebooks are deterministic (subvectors of the stride-picked
    vectors, the same convention as IVF here — swap in per-subspace
    k-means offline for production); they broadcast, and each Arrow
    batch assigns codes with vectorized numpy distance computation —
    zero shuffle, nothing data-sized collected.  Distances round to
    6 dp before the argmin and centroids sort by id, so the
    lowest-cid-wins tie-break is engine-portable (SQL oracle:
    ROW_NUMBER over (d2, cid)).

    Returns long-form (vec_id, subspace, code) where ``code`` is the
    chosen centroid's vector id.
    """
    import numpy as np

    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "vec_id long, subspace int, code long")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    cent_rows = (
        df.filter((F.col(id_col) % centroid_stride) == 0)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )  # centroid set is small by contract (same bound as IVF)
    cids = np.array(sorted(r.cid for r in cent_rows))
    by_id = {r.cid: list(r.cvec) for r in cent_rows}
    cmat = np.array([by_id[c] for c in cids], dtype=np.float64)  # (C, dim)
    bc = df.sparkSession.sparkContext.broadcast((cids, cmat))
    renamed = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))

    def gen(batches):
        import numpy as _np
        import pandas as pd

        b_cids, b_cmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)  # (B, dim)
            ids = pdf["vec_id"].to_numpy()
            out_id, out_sub, out_code = [], [], []
            for j in range(m):
                Vj = V[:, j * sub : (j + 1) * sub]
                Cj = b_cmat[:, j * sub : (j + 1) * sub]
                d2 = ((Vj[:, None, :] - Cj[None, :, :]) ** 2).sum(-1)
                d2 = _np.round(d2, 6)
                picked = _np.argmin(d2, axis=1)  # first min = lowest cid
                out_id.extend(ids.tolist())
                out_sub.extend([j] * len(pdf))
                out_code.extend(b_cids[picked].tolist())
            yield pd.DataFrame(
                {"vec_id": out_id, "subspace": out_sub, "code": out_code}
            )

    return renamed.mapInPandas(gen, "vec_id long, subspace int, code long")


def kmeans_lloyd(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 100,
    iters: int = 2,
) -> DataFrame:
    """Spherical k-means, ``iters`` Lloyd rounds: stride-seeded
    centroids → cosine top-1 assignment → per-(cluster, dim) means →
    repeat.  Returns the final centroids as (cluster, dim, c) rows.

    Engine-portable determinism: assignment similarities and the
    centroid means round to 6 dp (ties break on lowest centroid id),
    so after every round both engines hold bit-identical centroids —
    an iterative ML algorithm a SQL oracle replays exactly.

    Scale shape per round: centroid batch broadcasts (k ≈ N/stride by
    construction, capped in production by training k-means|| offline);
    assignment is one corpus scan; the mean is one (cluster, dim)-keyed
    aggregation with map-side partials — rows never exceed k×d.  The
    expression-level cosine here is the oracle-matching form; swap in
    the Arrow GEMM assignment (assign_ivf_clusters) when k×d×batch
    justifies BLAS.
    """
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent = e.filter(F.col("vid") % stride == 0).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    means = None
    for _ in range(iters):
        scored = e.crossJoin(F.broadcast(cent)).select(
            "vid",
            "v",
            "cid",
            F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim"),
        )
        w = Window.partitionBy("vid").orderBy(
            F.col("sim").desc(), F.col("cid").asc()
        )
        assign = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vid", "v", F.col("cid").alias("cluster"))
        )
        rows = assign.select("cluster", F.posexplode("v").alias("dim", "x"))
        means = rows.groupBy("cluster", "dim").agg(
            (F.round(F.avg("x"), 6) + 0.0).alias("c")
        )
        cent = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("s"))
            .select(F.col("cluster").alias("cid"), F.col("s.c").alias("cv"))
        )
    return means.select(
        "cluster", F.col("dim").cast("int").alias("dim"), "c"
    )


def pc1_power_iteration(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    iters: int = 2,
) -> DataFrame:
    """Top principal direction of the embedding corpus by power
    iteration — the zero-ML-library PCA primitive behind whitening,
    anisotropy diagnostics and ABTT ("all-but-the-top") embedding
    post-processing.

    Each iteration is y = Σ_rows x·(xᵀv) followed by normalization —
    ONE corpus pass: the current direction rides a one-row broadcast,
    per-row dots are a sequential array fold (deterministic order, so
    engines agree bitwise), and the d per-dimension sums aggregate
    map-side into d rows.  Nothing is collected to the driver — the
    next direction is again a one-row relation.  Per-dim sums and
    normalized components round to 6 dp each iteration (the
    kmeans/pagerank lockstep device), making the whole iteration
    SQL-replayable.  Returns ``(dim_idx, loading)``, d rows.
    """
    import math

    spark = corpus.sparkSession
    xs = corpus.select(F.col(vec_col).cast("array<double>").alias("x"))
    v0 = round(1.0 / math.sqrt(dim), 6)
    v_df = spark.range(1).select(F.array_repeat(F.lit(v0), dim).alias("v"))
    for _ in range(iters):
        dotted = xs.crossJoin(F.broadcast(v_df)).select(
            "x",
            F.aggregate(
                F.zip_with("x", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ).alias("dot"),
        )
        comps = dotted.select(
            F.posexplode(F.transform("x", lambda e: e * F.col("dot"))).alias(
                "d", "val"
            )
        )
        y = comps.groupBy("d").agg(F.round(F.sum("val"), 6).alias("s"))
        y_row = y.agg(
            F.array_sort(F.collect_list(F.struct("d", "s"))).alias("ys")
        ).select(F.col("ys").getField("s").alias("y"))
        norm = F.sqrt(
            F.aggregate("y", F.lit(0.0), lambda a, e: a + e * e)
        )
        v_df = y_row.select(
            F.transform("y", lambda e: F.round(e / norm, 6)).alias("v")
        )
    return v_df.select(F.posexplode("v").alias("dim_idx", "loading")).select(
        F.col("dim_idx").cast("int").alias("dim_idx"), "loading"
    )


def abtt_debias(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    iters: int = 2,
) -> DataFrame:
    """All-but-the-top embedding post-processing (Mu & Viswanath 2018):
    remove the corpus's dominant direction from every vector —
    ``x' = x − (x·v₁)v₁`` with v₁ from :func:`pc1_power_iteration` —
    the cheap fix for anisotropic embedding spaces that inflate all
    cosine similarities.

    One corpus pass: v₁ is a one-row broadcast; the projection is a
    sequential array fold + ``zip_with`` (bitwise engine-portable);
    components round to 6 dp.  Returns ``(vec_id, debiased)``.
    """
    v1 = (
        pc1_power_iteration(corpus, vec_col=vec_col, dim=dim, iters=iters)
        .agg(F.array_sort(F.collect_list(F.struct("dim_idx", "loading"))).alias("s"))
        .select(F.col("s").getField("loading").alias("v"))
    )
    xs = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("x")
    )
    dot = F.aggregate(
        F.zip_with("x", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, e: acc + e
    )
    return (
        xs.crossJoin(F.broadcast(v1))
        .withColumn("_dot", dot)
        .select(
            "vec_id",
            F.zip_with(
                "x", "v", lambda a, b: F.round(a - F.col("_dot") * b, 6)
            ).alias("debiased"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    centroid_stride: int = 50,
    nprobe: int = 4,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ with asymmetric distance computation (ADC, Jégou et al.
    PAMI'11) — the composition every billion-scale ANN index runs:
    IVF routes each query to ``nprobe`` clusters, the probed corpus is
    scored against PQ CODES (m bytes per vector) instead of raw floats,
    and scoring is a lookup-table sum — the query builds one small
    distance table (m × codebook) and never touches corpus floats.

    ``rerank=R`` adds the standard refine stage (Faiss
    ``IndexRefineFlat``): the ADC shortlist of R candidates per query
    re-scores with exact L2 on raw vectors — floats are fetched for
    R·|queries| rows only, never the corpus — and the top-k comes from
    the exact distances.  This recovers most of the PQ coding loss for
    one shortlist-sized join.

    Scale shape: the codes relation IS the index (m bytes/vector, ~64×
    smaller than raw); the only corpus-sized operations are the two
    zero-shuffle Arrow passes that build it (assignment + coding) and
    one vec_id-grain join of the PROBED subset against its codes.  The
    distance table is queries × m × C rows — broadcast — so ADC is a
    broadcast-join + integer SUM, exact in any engine: per-entry d2
    rounds to 6 dp then scales to BIGINT micro-units, making the
    8-term ADC sum order-independent (integer) and the oracle replay
    bit-for-bit.

    Returns (qid, vec_id, adc_d2, rank) — rank by (adc_d2 asc, vec_id
    asc).  Approximate by construction: recall floor vs exact L2 is
    asserted in tests/test_similarity.py."""
    first = corpus.select(vec_col).first()
    if first is None:
        return corpus.sparkSession.createDataFrame(
            [], "qid long, vec_id long, adc_d2 double, rank int"
        )
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    assigned, centroids = assign_ivf_clusters(
        corpus, id_col=id_col, vec_col=vec_col, centroid_stride=centroid_stride
    )
    codes = pq_codes(corpus, id_col=id_col, vec_col=vec_col, m=m,
                     centroid_stride=centroid_stride)
    cents = corpus.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    # IVF probe: top-nprobe clusters per query by 6-dp cosine, lowest
    # cid wins ties (identical to ivf_topk's routing)
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("sim").desc(), F.col("cid").asc()
                )
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("qid", F.col("cid").alias("cluster"))
    )
    # ADC distance table: (qid, subspace, cid) -> integer micro-units
    subspace = F.posexplode(F.sequence(F.lit(0), F.lit(m - 1)))
    d2 = F.aggregate(
        F.zip_with(
            F.expr(f"slice(qvec, subspace * {sub} + 1, {sub})"),
            F.expr(f"slice(cvec, subspace * {sub} + 1, {sub})"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dtab = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "cid", "qvec", "cvec", subspace.alias("_p", "subspace"))
        .select(
            "qid",
            "subspace",
            "cid",
            F.round(F.round(d2, 6) * 1000000.0, 0).cast("bigint").alias("micro"),
        )
    )
    probed = assigned.join(probes, "cluster").filter(
        F.col("vec_id") != F.col("qid")
    ).select("qid", "vec_id")
    adc = (
        probed.join(codes, "vec_id")
        .join(
            F.broadcast(dtab.withColumnRenamed("cid", "code")),
            ["qid", "subspace", "code"],
        )
        .groupBy("qid", "vec_id")
        .agg((F.sum("micro") / 1000000.0).alias("adc_d2"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_d2").asc(), F.col("vec_id").asc())
    if rerank is None:
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", F.round("adc_d2", 6).alias("adc_d2"), "rank")
        )
    shortlist = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("qid", "vec_id")
    )
    vecs = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    exact_d2 = F.aggregate(
        F.zip_with("qvec", "vec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rescored = (
        shortlist.join(vecs, "vec_id")
        .join(q, "qid")
        .select("qid", "vec_id", F.round(exact_d2, 6).alias("adc_d2"))
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("adc_d2").asc(), F.col("vec_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "adc_d2", "rank")
    )


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    coarse_dims: int = 16,
    candidates: int = 50,
) -> DataFrame:
    """Two-stage top-k with a PREFIX-dimension coarse filter
    (matryoshka-representation retrieval, Kusupati et al. 2022 —
    public): stage 1 scores every corpus vector on only its first
    ``coarse_dims`` components (a ``coarse_dims/dim`` FLOP and
    bandwidth cut on the full corpus scan), keeps the top
    ``candidates`` per query, and stage 2 re-ranks just those with the
    EXACT full-dimension cosine.  The vector analogue of the PPJoin
    prefix filter: cheap bound first, exact verify on survivors.

    Both stages are deterministic (6-dp rounded scores, id
    tie-breaks), so a SQL oracle replays the SAME two-stage
    definition; recall vs the exact brute-force twin is asserted in
    tests, not assumed.  The coarse top-``candidates`` is a TWO-LEVEL
    selection (per-(qid, salt) top-C first, then top-C of the
    ``n_salts * C`` survivors — lossless: every global top-C row is
    top-C within its own salt), so no window ever spans the corpus per
    query; the exact stage is ``candidates``-bounded.
    Output: (qid, vec_id, sim, rank), self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    )
    coarse_q = F.slice(F.col("qvec"), 1, coarse_dims)
    coarse_c = F.slice(F.col("cvec"), 1, coarse_dims)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "qvec",
            "cvec",
            F.round(cosine(coarse_q, coarse_c), 6).alias("coarse"),
        )
    )
    cand = _two_level_topc(scored, "coarse", candidates)
    exact = cand.select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("sim"),
    )
    return _rank_topk(exact, k)


def matryoshka_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    centroid_stride: int = 50,
    nprobe: int = 4,
    coarse_dims: int = 16,
    candidates: int = 50,
) -> DataFrame:
    """IVF probe x matryoshka prefix — the two sub-linear retrieval
    devices COMPOSED, and they multiply: the probe restricts the scan
    to ~``nprobe/nclusters`` of the corpus (:func:`ivf_topk`), and
    inside the probed clusters the coarse score reads only the first
    ``coarse_dims`` vector components (:func:`matryoshka_topk`), so
    stage-1 work is ``(nprobe/nclusters) x (coarse_dims/dim)`` of a
    brute-force scan; the exact full-dimension re-rank touches only
    ``candidates`` rows per query.

    Probe SELECTION stays full-dimension (the centroid set is tiny by
    the IVF contract — C ≈ √N broadcast rows — so prefix-truncating it
    saves nothing and would stack a third recall loss).  Every stage is
    deterministic (deterministic stride centroids, 6-dp rounding, id
    tie-breaks), so a SQL oracle replays the SAME composed definition;
    recall vs the brute-force twin is asserted in tests, not assumed.
    The coarse top-``candidates`` is the same TWO-LEVEL lossless
    selection as :func:`matryoshka_topk` (per-(qid, salt) top-C, then
    top-C of survivors) — no window spans the probed set per query.
    Output: (qid, vec_id, sim, rank), self-matches excluded."""
    assigned, centroids = assign_ivf_clusters(
        corpus, id_col=id_col, vec_col=vec_col, centroid_stride=centroid_stride
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    coarse_q = F.slice(F.col("qvec"), 1, coarse_dims)
    coarse_c = F.slice(F.col("vec"), 1, coarse_dims)
    scored = (
        assigned.join(_ivf_probes(q, centroids, nprobe), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "qvec",
            "vec",
            F.round(cosine(coarse_q, coarse_c), 6).alias("coarse"),
        )
    )
    cand = _two_level_topc(scored, "coarse", candidates)
    exact = cand.select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("sim"),
    )
    return _rank_topk(exact, k)
