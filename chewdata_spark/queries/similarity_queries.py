"""Similarity-search operators as verifiable queries over `embeddings`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chewdata_spark.operators import similarity
from chewdata_spark.tables import load_table

N_QUERY_VECS = 5
TOPK = 10

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k for the first 5 vectors as queries."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.cosine_topk(emb, queries, k=TOPK)


COSINE_TOPK_SQL = f"""
WITH q AS (
    SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
    FROM embeddings WHERE vec_id < {N_QUERY_VECS}
), scored AS (
    SELECT qid, e.vec_id,
           ROUND({_COS.format(a='qvec', b='e.embedding::DOUBLE[]')}, 6) AS sim
    FROM q, embeddings e
    WHERE e.vec_id <> qid
), ranked AS (
    SELECT qid, vec_id, sim,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT qid, vec_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {TOPK}
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine ≥ 0.4 via the blocked-GEMM kernel
    (:func:`chewdata_spark.operators.similarity.near_dup_pairs_exact`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # auto-sized blocking: memory bound at cluster scale, parallelism
    # floor at test scale (operator docstring)
    return similarity.near_dup_pairs_exact(emb, threshold=0.4)


NEAR_DUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_COS.format(a='a.v', b='b.v')}, 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({_COS.format(a='a.v', b='b.v')}, 6) >= 0.4
"""


def embedding_near_dup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic near-dup pairs: IVF cluster blocking with
    multi-probe assignment — the 100-TB path; per-cluster GEMM verify,
    one shuffle keyed by cluster.  Oracle-backed since round 5 (the
    6-dp-rounded assignment makes cluster membership engine-portable);
    recall ≥0.9 vs the exact GEMM twin stays asserted in
    tests/test_dedup_recall.py (0.996 at sf0.1, zero false positives)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, centroid_stride=100, nprobe=6
    )


NEAR_DUP_CLUSTERED_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 100 = 0),
asg AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND({_COS.format(a='e.v', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM e, cent c
    ) WHERE rk <= 6
),
pairs AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM asg a JOIN asg b USING (cluster)
    WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND({_COS.format(a='ea.v', b='eb.v')}, 6) AS sim
FROM pairs
JOIN e ea ON ea.vec_id = id_a
JOIN e eb ON eb.vec_id = id_b
WHERE ROUND({_COS.format(a='ea.v', b='eb.v')}, 6) >= 0.4
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (probe 4 of ~n/50 clusters).  Fully
    oracle-backed since round 5: assignment/probe similarities round to
    6 dp with lowest-cid tie-break, so the deterministic IVF pipeline
    (stride centroids → top-1 assignment → top-4 probes → exact rerank)
    is reproducible in SQL; recall vs `cosine_topk` stays asserted in
    tests/."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.ivf_topk(emb, queries, k=TOPK, centroid_stride=50, nprobe=4)


IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0),
asg AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND({_COS.format(a='e.v', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM e, cent c
    ) WHERE rk = 1
),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}),
probes AS (
    SELECT qid, cid AS cluster FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND({_COS.format(a='q.qv', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM q, cent c
    ) WHERE rk <= 4
),
scored AS (
    SELECT p.qid, a.vec_id,
           ROUND({_COS.format(a='q.qv', b='e.v')}, 6) AS sim
    FROM probes p
    JOIN asg a USING (cluster)
    JOIN e ON e.vec_id = a.vec_id
    JOIN q ON q.qid = p.qid
    WHERE a.vec_id <> p.qid
)
SELECT qid, vec_id, sim, CAST(rk AS INT) AS rank FROM (
    SELECT qid, vec_id, sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, vec_id ASC) AS rk
    FROM scored
) WHERE rk <= {TOPK}
"""


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit: per-query recall@10 of the IVF index
    against the exact brute-force ranking — the dashboard number an
    ANN deployment watches (tests assert recall bounds; this exposes
    the same measurement as a driver-checked QUERY so index quality is
    an auditable artifact, not a test-only fact).  Exact INT hit
    counts; recall rounded to 6 dp.  At scale both sides are the
    already-benched operators — brute force stays the verification
    twin you run on a sampled query set, the IVF side is the
    production path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = similarity.cosine_topk(emb, queries, k=TOPK).select(
        "qid", "vec_id"
    )
    approx = similarity.ivf_topk(
        emb, queries, k=TOPK, centroid_stride=50, nprobe=4
    ).select("qid", "vec_id")
    hits = exact.join(approx, ["qid", "vec_id"], "left_semi")
    per_q = (
        exact.groupBy("qid")
        .agg(F.count(F.lit(1)).alias("_k"))
        .join(
            hits.groupBy("qid").agg(F.count(F.lit(1)).alias("_h")),
            "qid",
            "left",
        )
    )
    return per_q.select(
        "qid",
        F.coalesce("_h", F.lit(0)).cast("int").alias("n_hits"),
        F.round(F.coalesce("_h", F.lit(0)) / F.col("_k"), 6).alias("recall"),
    )


ANN_RECALL_SQL = f"""
WITH brute AS (SELECT qid, vec_id FROM ({COSINE_TOPK_SQL})),
approx AS (SELECT qid, vec_id FROM ({IVF_TOPK_SQL})),
hits AS (
    SELECT b.qid, COUNT(*) AS n
    FROM brute b JOIN approx a USING (qid, vec_id)
    GROUP BY b.qid
), ke AS (SELECT qid, COUNT(*) AS k FROM brute GROUP BY qid)
SELECT ke.qid,
       CAST(COALESCE(h.n, 0) AS INT) AS n_hits,
       ROUND(COALESCE(h.n, 0) * 1.0 / ke.k, 6) AS recall
FROM ke LEFT JOIN hits h USING (qid)
"""


def ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k (Charikar hyperplane hashing): banded
    sign-bit buckets propose candidates, exact cosine verifies.  The
    synthetic embeddings have near-random neighbors, so bands are tuned
    narrow (5 bits) for recall ≥0.6; real corpora with tighter clusters
    run wider bands.  Rows-only check; recall vs `cosine_topk` asserted
    in tests/test_dedup_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.srp_topk(emb, queries, k=TOPK, n_bits=120, band_bits=5)


def ann_srp_topk_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH top-k with md5-derived ±1 projections
    (operators/similarity.py::srp_topk_portable) — the fully
    oracle-backed twin of `ann_srp_topk`, whose seeded Gaussian matrix
    SQL cannot reproduce.  The DuckDB oracle re-derives the sign matrix
    from md5 in SQL, replays the sequential-fold dots (6-dp rounded
    before the sign test), the 4×8-bit banding, the probe join and the
    exact-cosine rank verbatim."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.srp_topk_portable(
        emb, queries, dim=64, k=TOPK, n_bits=32, band_bits=8
    )


# Sign matrix row j = md5('srp|' || j): sign(j, d) = +1 iff bit
# (3 - d % 4) of hex digit d // 4 is set — identical digit/bit walk to
# SIMHASH_MD5_SQL, so the Spark-side hashlib constants replay exactly.
SRP_MD5_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), signs AS (
    SELECT j, d,
           CASE WHEN ((strpos('0123456789abcdef',
                      substr(md5('srp|' || CAST(j AS VARCHAR)),
                             (d // 4) + 1, 1)) - 1)
                  >> (3 - (d % 4))) & 1 = 1
                THEN 1.0 ELSE -1.0 END AS s
    FROM (SELECT unnest(generate_series(0, 31)) AS j),
         (SELECT unnest(generate_series(0, 63)) AS d)
), sb AS (
    SELECT j, list(s ORDER BY d) AS sl FROM signs GROUP BY j
), dots AS (
    SELECT e.vec_id, sb.j,
           CASE WHEN ROUND(list_sum([sl[i] * v[i] for i in range(1, 65)]), 6) >= 0
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
    FROM e, sb
), fp AS (
    SELECT vec_id, CAST(SUM(bit << j) AS BIGINT) AS fp FROM dots GROUP BY vec_id
), bands AS (
    SELECT vec_id, b AS band_idx, (fp >> (b * 8)) & 255 AS band_val
    FROM fp, (SELECT unnest(generate_series(0, 3)) AS b)
), cand AS (
    SELECT q.vec_id AS qid, c.vec_id
    FROM bands q JOIN bands c
      ON q.band_idx = c.band_idx AND q.band_val = c.band_val
    WHERE q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
    GROUP BY 1, 2
), scored AS (
    SELECT cand.qid, cand.vec_id,
           ROUND({_COS.format(a='q.v', b='c.v')}, 6) AS sim
    FROM cand
    JOIN e q ON q.vec_id = cand.qid
    JOIN e c ON c.vec_id = cand.vec_id
)
SELECT qid, vec_id, sim, CAST(rk AS INT) AS rank FROM (
    SELECT qid, vec_id, sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, vec_id ASC) AS rk
    FROM scored
) WHERE rk <= {TOPK}
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vectors (the k-means M-step / class-prototype
    computation), emitted as (label, dim, c) rows.

    Scale shape: posexplode is map-side; the ONE shuffle keys on
    (label, dim) — |labels|×|dims| groups with map-side partial
    averages, so the reduce side sees a few thousand rows regardless of
    corpus size.  No vector is ever assembled driver-side; downstream
    consumers re-collect the (label, dim) rows into arrays with a
    sort_array(collect_list) keyed by label when needed.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    # + 0.0 normalizes IEEE negative zero: round can yield -0.0, whose
    # string form differs between engines even though -0.0 == 0.0
    return ex.groupBy("label", "dim").agg((F.round(F.avg("v"), 4) + 0.0).alias("c"))


CENTROIDS_SQL = """
SELECT label, CAST(dim AS INT) AS dim, ROUND(AVG(v), 4) + 0.0 AS c
FROM (
    SELECT label, unnest(embedding) AS v,
           unnest(range(0, len(embedding))) AS dim
    FROM embeddings
)
GROUP BY 1, 2
"""


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding table (long-form
    (vec_id, dim, code)) — see operators/similarity.py::scalar_quantize
    for the distributed codebook shape."""
    from chewdata_spark.operators.similarity import scalar_quantize

    emb = load_table(spark, sf_dir, "embeddings")
    return scalar_quantize(emb, "vec_id", "embedding")


QUANTIZE_SQL = """
WITH e AS (
    SELECT vec_id,
           CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
stats AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim)
SELECT vec_id, dim,
       CASE WHEN mx = mn THEN -128
            ELSE CAST(round((x - mn) / (mx - mn) * 255) - 128 AS INT) END AS code
FROM e JOIN stats USING (dim)
"""


def pq_code_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize the embedding table into 8 one-byte-per-
    subspace codes — operators/similarity.py::pq_codes."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_codes(emb, m=8, centroid_stride=50)


PQ_SQL = """
WITH dims AS (
    SELECT vec_id,
           CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
meta AS (SELECT MAX(dim) + 1 AS d FROM dims),
sub AS (
    SELECT vec_id, CAST(dim // (d // 8) AS INT) AS subspace, dim, x
    FROM dims, meta
),
cent AS (
    SELECT vec_id AS cid, dim, x AS cx FROM sub WHERE vec_id % 50 = 0
),
d2 AS (
    SELECT s.vec_id, s.subspace, c.cid,
           ROUND(SUM((s.x - c.cx) * (s.x - c.cx)), 6) AS dist
    FROM sub s JOIN cent c ON s.dim = c.dim
    GROUP BY 1, 2, 3
),
r AS (
    SELECT vec_id, subspace, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                              ORDER BY dist, cid) AS rk
    FROM d2
)
SELECT vec_id, subspace, cid AS code FROM r WHERE rk = 1
"""


def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: top-5 most-similar other-label
    vectors per query — operators/similarity.py::hard_negative_topk."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.hard_negative_topk(emb, queries, k=5)


HARD_NEGATIVES_SQL = f"""
WITH q AS (
    SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qlabel
    FROM embeddings WHERE vec_id < {N_QUERY_VECS}
), scored AS (
    SELECT qid, e.vec_id,
           ROUND({_COS.format(a='qvec', b='e.embedding::DOUBLE[]')}, 6) AS sim
    FROM q, embeddings e
    WHERE e.vec_id <> qid AND e.label <> qlabel
), ranked AS (
    SELECT qid, vec_id, sim,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT qid, vec_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""


QUERIES = {
    "embedding_centroids": embedding_centroids,
    "hard_negatives_topk": hard_negatives_topk,
    "pq_code_embeddings": pq_code_embeddings,
    "quantize_embeddings": quantize_embeddings,
    "cosine_topk": cosine_topk,
    "embedding_near_dup": embedding_near_dup,
    "embedding_near_dup_clustered": embedding_near_dup_clustered,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_srp_topk": ann_srp_topk,
    "ann_srp_topk_md5": ann_srp_topk_md5,
    "ann_recall_report": ann_recall_report,
}

ORACLES = {
    "embedding_centroids": CENTROIDS_SQL,
    "hard_negatives_topk": HARD_NEGATIVES_SQL,
    "pq_code_embeddings": PQ_SQL,
    "ann_ivf_topk": IVF_TOPK_SQL,
    "ann_srp_topk_md5": SRP_MD5_SQL,
    "embedding_near_dup_clustered": NEAR_DUP_CLUSTERED_SQL,
    "quantize_embeddings": QUANTIZE_SQL,
    "cosine_topk": COSINE_TOPK_SQL,
    "embedding_near_dup": NEAR_DUP_SQL,
    "ann_recall_report": ANN_RECALL_SQL,
}

def hybrid_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern retrieval shape, retrieve-then-rerank: lexical recall
    (candidates share >= 2 distinct terms with the query doc) followed
    by embedding-cosine re-ranking — documents and embeddings join on
    their aligned ids.

    Scale shape: distinct doc terms pre-aggregate before the term
    semi-join (the query side broadcasts — a handful of docs); cosine
    runs ONLY on candidates; the final top-k is a per-query window.
    Fully oracle-backed."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    toks = docs.select(
        F.col("doc_id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("term"),
    )
    q_toks = toks.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"), "term"
    )
    cand = (
        toks.join(F.broadcast(q_toks), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_terms"))
        .filter(F.col("n_shared_terms") >= 2)
    )
    e_d = emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("dv"))
    e_q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        cand.join(e_d, "doc_id")
        .join(F.broadcast(e_q), "qid")
        .select(
            "qid",
            "doc_id",
            "n_shared_terms",
            F.round(similarity.cosine(F.col("qv"), F.col("dv")), 6).alias("sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


HYBRID_SEARCH_SQL = f"""
WITH toks AS (
    SELECT DISTINCT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
),
q AS (SELECT doc_id AS qid, term FROM toks WHERE doc_id < 3),
cand AS (
    SELECT q.qid, t.doc_id, COUNT(*) AS n_shared_terms
    FROM toks t JOIN q ON t.term = q.term AND t.doc_id <> q.qid
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
    SELECT c.qid, c.doc_id, c.n_shared_terms,
           ROUND({_COS.format(a='eq.v', b='ed.v')}, 6) AS sim
    FROM cand c
    JOIN e ed ON ed.vec_id = c.doc_id
    JOIN e eq ON eq.vec_id = c.qid
)
SELECT qid, doc_id, n_shared_terms, sim, CAST(rk AS INT) AS rank FROM (
    SELECT qid, doc_id, n_shared_terms, sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, doc_id ASC) AS rk
    FROM scored
) WHERE rk <= 5
"""


QUERIES["hybrid_search_topk"] = hybrid_search_topk
ORACLES["hybrid_search_topk"] = HYBRID_SEARCH_SQL


def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic lexical ranked retrieval: Okapi BM25 (k1=1.2, b=0.75)
    scoring every corpus document against each query document's
    distinct terms, top-10 per query.

    Scale shape — every branch (term frequencies, document lengths,
    document frequencies, query term sets) pre-aggregates to the
    (doc_id, term) grain before joining, so joins move index-sized
    relations, never raw tokens; the corpus-level N/avgdl constants
    ride a one-row broadcast, the per-(qid, doc) score is a single sum
    aggregation and the top-k is a qid-partitioned window.  No collect,
    no window over the raw corpus.  (Catalyst's differing column prunes
    keep the branch tokenizations from canonicalizing into one
    exchange; a production deployment persists the (doc, term, tf)
    inverted index once and serves every query from it.)  Fully
    oracle-backed."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    qterms = tf.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"), "term"
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(df_t, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "doc_id", "score", F.col("rank").cast("int").alias("rank"))
    )


BM25_SQL = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
qterms AS (SELECT DISTINCT doc_id AS qid, term FROM tf WHERE doc_id < 3),
scored AS (
    SELECT q.qid, t.doc_id,
           ROUND(SUM(
               ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
               * (t.tf * 2.2)
                 / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
           ), 6) AS score
    FROM tf t
    JOIN qterms q USING (term)
    JOIN df_t f USING (term)
    JOIN dl d ON d.doc_id = t.doc_id
    CROSS JOIN stats s
    WHERE t.doc_id <> q.qid
    GROUP BY q.qid, t.doc_id
),
ranked AS (
    SELECT qid, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT qid, doc_id, score, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
"""

QUERIES["bm25_search_topk"] = bm25_search_topk
ORACLES["bm25_search_topk"] = BM25_SQL


def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two retrieval paths (the standard
    hybrid-search combiner): RRF(d) = Σ 1/(60 + rank_i(d)) over the
    BM25 ranking and the embedding-cosine ranking, top-10 per query.
    A full-outer join of two already-top-k lists — the fusion moves
    only k-sized rankings, never corpus rows."""
    from pyspark.sql.window import Window

    bm = bm25_search_topk(spark, sf_dir).select(
        "qid", F.col("doc_id").alias("did"), F.col("rank").alias("br")
    )
    cos = (
        cosine_topk(spark, sf_dir)
        .filter(F.col("qid") < 3)
        .select("qid", F.col("vec_id").alias("did"), F.col("rank").alias("cr"))
    )
    fused = bm.join(cos, ["qid", "did"], "full_outer").select(
        "qid",
        "did",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("br")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("cr")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("rrf_score").desc(), F.col("did").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "did", "rrf_score", F.col("rank").cast("int").alias("rank"))
    )


RRF_SQL = f"""
WITH bm AS ({BM25_SQL}),
cos AS ({COSINE_TOPK_SQL}),
fused AS (
    SELECT COALESCE(b.qid, c.qid) AS qid,
           COALESCE(b.doc_id, c.vec_id) AS did,
           ROUND(COALESCE(1.0 / (60 + b.rank), 0.0)
                 + COALESCE(1.0 / (60 + c.rank), 0.0), 6) AS rrf_score
    FROM bm b
    FULL OUTER JOIN (SELECT * FROM cos WHERE qid < 3) c
      ON b.qid = c.qid AND b.doc_id = c.vec_id
)
SELECT qid, did, rrf_score, CAST(rk AS INT) AS rank FROM (
    SELECT qid, did, rrf_score,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rrf_score DESC, did ASC) AS rk
    FROM fused
) WHERE rk <= 10
"""

QUERIES["rrf_fusion_topk"] = rrf_fusion_topk
ORACLES["rrf_fusion_topk"] = RRF_SQL


def kmeans_centroids_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds of spherical k-means over the embedding table —
    operators/similarity.py::kmeans_lloyd.  An ITERATIVE ML algorithm
    the SQL oracle replays exactly: 6-dp-rounded assignments and means
    keep both engines' centroids bit-identical between rounds."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_lloyd(emb, stride=100, iters=2)


_KM_COS = _COS.format(a="e.v", b="c.cv")
KMEANS_SQL = f"""
WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT vid AS cid, v AS cv FROM e WHERE vid % 100 = 0),
a1 AS (
    SELECT vid, v, cid AS cluster FROM (
        SELECT e.vid, e.v, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vid
                   ORDER BY ROUND({_COS.format(a='e.v', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM e, c0 c
    ) WHERE rk = 1
),
r1 AS (
    SELECT cluster, CAST(unnest(range(0, len(v))) AS INT) AS dim,
           unnest(v) AS x
    FROM a1
),
m1 AS (SELECT cluster, dim, ROUND(AVG(x), 6) + 0.0 AS c FROM r1 GROUP BY 1, 2),
c1 AS (SELECT cluster AS cid, list(c ORDER BY dim) AS cv FROM m1 GROUP BY 1),
a2 AS (
    SELECT vid, v, cid AS cluster FROM (
        SELECT e.vid, e.v, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vid
                   ORDER BY ROUND({_COS.format(a='e.v', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM e, c1 c
    ) WHERE rk = 1
),
r2 AS (
    SELECT cluster, CAST(unnest(range(0, len(v))) AS INT) AS dim,
           unnest(v) AS x
    FROM a2
),
m2 AS (SELECT cluster, dim, ROUND(AVG(x), 6) + 0.0 AS c FROM r2 GROUP BY 1, 2)
SELECT cluster, dim, c FROM m2
"""

QUERIES["kmeans_centroids_2iter"] = kmeans_centroids_2iter
ORACLES["kmeans_centroids_2iter"] = KMEANS_SQL


def embedding_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus (2 power
    iterations, 6-dp lockstep rounding) —
    operators/similarity.py::pc1_power_iteration.  The oracle replays
    both iterations: per-row fold dots are sequential in both engines,
    per-dim sums round before normalization."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pc1_power_iteration(emb, vec_col="embedding", dim=64, iters=2)


def _pc1_iter_sql(i: int) -> str:
    """One power iteration: v{i} -> y{i} (rounded per-dim sums) -> v{i+1}."""
    return f"""d{i} AS (
    SELECT x, list_sum([x[j] * v[j] for j in range(1, 65)]) AS dot
    FROM xs, v{i}
), c{i} AS (
    SELECT j, ROUND(SUM(x[j] * dot), 6) AS s
    FROM d{i}, (SELECT unnest(generate_series(1, 64)) AS j)
    GROUP BY j
), y{i} AS (
    SELECT list(s ORDER BY j) AS y FROM c{i}
), v{i + 1} AS (
    SELECT [ROUND(e / sqrt(list_sum([f * f for f in y])), 6) for e in y] AS v
    FROM y{i}
)"""


PC1_SQL = f"""
WITH xs AS (
    SELECT embedding::DOUBLE[] AS x FROM embeddings
), v1 AS (
    SELECT [ROUND(1.0 / sqrt(64), 6) for j in range(1, 65)] AS v
), {_pc1_iter_sql(1)}, {_pc1_iter_sql(2)}
SELECT CAST(j - 1 AS INT) AS dim_idx, v[j] AS loading
FROM v3, (SELECT unnest(generate_series(1, 64)) AS j)
"""

QUERIES["embedding_pc1"] = embedding_pc1
ORACLES["embedding_pc1"] = PC1_SQL


def embedding_debias_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top debiasing: every embedding minus its projection
    onto the corpus PC1 (operators/similarity.py::abtt_debias) — the
    anisotropy correction applied before cosine retrieval.  Output is
    driver-canonical scalar rows ``(vec_id, dim, value)`` (posexplode of
    the debiased vector — the `embedding_pc1` convention; the driver's
    pandas canonicalizer cannot sort array-valued columns)."""
    emb = load_table(spark, sf_dir, "embeddings")
    deb = similarity.abtt_debias(emb, vec_col="embedding", dim=64, iters=2)
    return deb.select(
        "vec_id", F.posexplode("debiased").alias("dim", "value")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "value")


ABTT_SQL = f"""
WITH xs AS (
    SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
), v1 AS (
    SELECT [ROUND(1.0 / sqrt(64), 6) for j in range(1, 65)] AS v
), {_pc1_iter_sql(1)}, {_pc1_iter_sql(2)}
SELECT vec_id, CAST(j - 1 AS INT) AS dim,
       ROUND(x[j] - list_sum([x[i] * v[i] for i in range(1, 65)]) * v[j], 6)
           AS value
FROM xs, v3, (SELECT unnest(generate_series(1, 64)) AS j)
"""

QUERIES["embedding_debias_abtt"] = embedding_debias_abtt
ORACLES["embedding_debias_abtt"] = ABTT_SQL


def embedding_anisotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding-space health report: vector count, mean L2
    norm, and the anisotropy estimate ||mean unit vector||² — the
    expected cosine between two random embeddings, the number ABTT
    debiasing (`embedding_debias_abtt`) exists to reduce.  One corpus
    pass for per-row norms (sequential fold, engine-bitwise) + one
    per-dimension aggregate for the mean direction (64 rows; per-dim
    means round to 6 dp before the norm so both engines agree)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # NULL embeddings excluded explicitly on BOTH sides (the oracle
    # filters identically), so n_vecs is symmetric by construction
    xs = emb.filter(F.col("embedding").isNotNull()).select(
        F.col("embedding").cast("array<double>").alias("x")
    )
    norm = F.sqrt(
        F.aggregate("x", F.lit(0.0), lambda a, e: a + e * e)
    )
    normed = xs.select(
        F.posexplode(F.transform("x", lambda e: e / norm)).alias("d", "u")
    )
    per_dim = normed.groupBy("d").agg(F.round(F.avg("u"), 6).alias("mu"))
    mu_norm_sq = per_dim.agg(
        F.round(F.sum(F.col("mu") * F.col("mu")), 6).alias("anisotropy")
    )
    norms = xs.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(norm), 6).alias("mean_norm"),
    )
    return mu_norm_sq.crossJoin(F.broadcast(norms)).select(
        F.col("n_vecs").cast("bigint"), "mean_norm", "anisotropy"
    )


ANISOTROPY_SQL = """
WITH xs AS (
    SELECT embedding::DOUBLE[] AS x FROM embeddings WHERE embedding IS NOT NULL
), withn AS (
    SELECT x, sqrt(list_sum([e * e for e in x])) AS n FROM xs
), dims AS (
    -- dimension bound from the row's own array length, not a constant
    SELECT u.i AS d, x[u.i] / n AS u
    FROM withn, unnest(generate_series(1, len(x))) AS u(i)
), per_dim AS (
    SELECT d, ROUND(AVG(u), 6) AS mu FROM dims GROUP BY d
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM withn) AS n_vecs,
       (SELECT ROUND(AVG(n), 6) FROM withn) AS mean_norm,
       (SELECT ROUND(SUM(mu * mu), 6) FROM per_dim) AS anisotropy
"""

QUERIES["embedding_anisotropy_report"] = embedding_anisotropy_report
ORACLES["embedding_anisotropy_report"] = ANISOTROPY_SQL


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ADC top-k — the billion-scale ANN composition (IVF
    routing + product-quantized codes + asymmetric distance lookup
    tables); operators/similarity.py::ivfpq_topk.  Fully oracle-backed:
    routing and coding reuse the deterministic 6-dp/lowest-cid devices
    of ann_ivf_topk and pq_code_embeddings, and the ADC sum is integer
    micro-units, so DuckDB replays the whole index bit-for-bit.  Runs
    with the standard refine stage (ADC top-100 shortlist → exact L2
    re-rank), which recovers the PQ coding loss up to the routing
    ceiling (recall floor pinned in tests/test_dedup_recall.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.ivfpq_topk(
        emb, queries, k=TOPK, m=8, centroid_stride=50, nprobe=4, rerank=100
    )


ANN_IVFPQ_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0),
asg AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND({_COS.format(a='e.v', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM e, cent c
    ) WHERE rk = 1
),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}),
probes AS (
    SELECT qid, cid AS cluster FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND({_COS.format(a='q.qv', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM q, cent c
    ) WHERE rk <= 4
),
dims AS (
    SELECT vec_id,
           CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
meta AS (SELECT MAX(dim) + 1 AS d FROM dims),
sub AS (
    SELECT vec_id, CAST(dim // (d // 8) AS INT) AS subspace, dim, x
    FROM dims, meta
),
scent AS (SELECT vec_id AS cid, subspace, dim, x AS cx FROM sub WHERE vec_id % 50 = 0),
cd2 AS (
    SELECT s.vec_id, s.subspace, c.cid,
           ROUND(SUM((s.x - c.cx) * (s.x - c.cx)), 6) AS dist
    FROM sub s JOIN scent c ON s.dim = c.dim
    GROUP BY 1, 2, 3
),
codes AS (
    SELECT vec_id, subspace, cid AS code FROM (
        SELECT vec_id, subspace, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY dist, cid) AS rk
        FROM cd2
    ) WHERE rk = 1
),
dtab AS (
    SELECT vec_id AS qid, subspace, cid,
           CAST(ROUND(dist * 1000000.0, 0) AS BIGINT) AS micro
    FROM cd2 WHERE vec_id < {N_QUERY_VECS}
),
probed AS (
    SELECT p.qid, a.vec_id
    FROM probes p JOIN asg a USING (cluster)
    WHERE a.vec_id <> p.qid
),
adc AS (
    SELECT pr.qid, pr.vec_id, SUM(dt.micro) / 1000000.0 AS adc_d2
    FROM probed pr
    JOIN codes co ON co.vec_id = pr.vec_id
    JOIN dtab dt ON dt.qid = pr.qid AND dt.subspace = co.subspace
                AND dt.cid = co.code
    GROUP BY 1, 2
),
short AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY adc_d2 ASC, vec_id ASC) AS rk
        FROM adc
    ) WHERE rk <= 100
),
rescored AS (
    SELECT sh.qid, sh.vec_id,
           ROUND(SUM((qs.x - vs.x) * (qs.x - vs.x)), 6) AS adc_d2
    FROM short sh
    JOIN dims qs ON qs.vec_id = sh.qid
    JOIN dims vs ON vs.vec_id = sh.vec_id AND vs.dim = qs.dim
    GROUP BY 1, 2
)
SELECT qid, vec_id, adc_d2, CAST(rk AS INT) AS rank FROM (
    SELECT qid, vec_id, adc_d2,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d2 ASC, vec_id ASC) AS rk
    FROM rescored
) WHERE rk <= {TOPK}
"""

QUERIES["ann_ivfpq_topk"] = ann_ivfpq_topk
ORACLES["ann_ivfpq_topk"] = ANN_IVFPQ_SQL


def split_embedding_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic split-leakage audit — the embedding-space twin of the
    token-level `split_leakage_audit`: after an 80/20 md5-coin split,
    find every (test, train) pair that is a semantic near-duplicate
    (cosine ≥ 0.4), i.e. eval examples whose answer effectively sits in
    the training set.  Pair discovery is the sub-quadratic clustered
    path (IVF blocking, multi-probe, per-cluster verify — never
    test × train), then one split-tag join orients pairs as
    (test_vec, train_vec).  Fully oracle-backed via the same 6-dp
    assignment device as embedding_near_dup_clustered."""
    from chewdata_spark.operators.curation import md5_hex16

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, centroid_stride=100, nprobe=6
    )
    split = emb.select(
        "vec_id",
        (md5_hex16(F.concat_ws("|", F.lit("sp"), F.col("vec_id").cast("string"))) % 10
         < 8).alias("is_train"),
    )
    a = split.select(F.col("vec_id").alias("id_a"), F.col("is_train").alias("tr_a"))
    b = split.select(F.col("vec_id").alias("id_b"), F.col("is_train").alias("tr_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("tr_a") != F.col("tr_b"))
        .select(
            F.when(F.col("tr_a"), F.col("id_b")).otherwise(F.col("id_a")).alias(
                "test_vec"
            ),
            F.when(F.col("tr_a"), F.col("id_a")).otherwise(F.col("id_b")).alias(
                "train_vec"
            ),
            "sim",
        )
    )


def _split_leak_sql() -> str:
    from chewdata_spark.queries.curation_queries import _hex16_sql

    coin = _hex16_sql("md5('sp|' || CAST(vec_id AS VARCHAR))")
    return f"""
WITH pairs AS ({NEAR_DUP_CLUSTERED_SQL}),
split AS (SELECT vec_id, ({coin}) % 10 < 8 AS is_train FROM embeddings)
SELECT CASE WHEN sa.is_train THEN p.id_b ELSE p.id_a END AS test_vec,
       CASE WHEN sa.is_train THEN p.id_a ELSE p.id_b END AS train_vec,
       p.sim
FROM pairs p
JOIN split sa ON sa.vec_id = p.id_a
JOIN split sb ON sb.vec_id = p.id_b
WHERE sa.is_train <> sb.is_train
"""


QUERIES["split_embedding_leakage"] = split_embedding_leakage
ORACLES["split_embedding_leakage"] = _split_leak_sql()


def embedding_outliers_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier sweep: top-20 vectors by diagonal
    Mahalanobis distance to the corpus distribution — the cheap
    mislabeled/garbage-vector detector run before clustering or dedup
    trusts the embedding column.

    Determinism devices (established in this repo): per-dimension mean
    and second moment are corpus aggregates ROUNDed to 6 dp (the
    anisotropy-report device); each of the 64 per-dim distance terms is
    then scaled to BIGINT micro-units before the per-vector SUM (the
    IVF-PQ ADC device), so the fold is order-independent by type and
    the integer sort key makes the top-20 tie-break (vec_id asc) exact.
    Scale shape: ONE posexplode pass → 64-row broadcast stats join →
    map-side-combinable per-vector sum → TakeOrdered(20); nothing
    corpus-quadratic, no unpartitioned sort of the corpus."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    dims = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "v"),
    )
    stats = (
        dims.groupBy("d")
        .agg(
            F.round(F.avg("v"), 6).alias("mu"),
            F.round(F.avg(F.col("v") * F.col("v")), 6).alias("m2"),
        )
        .withColumn(
            "var", F.col("m2") - F.col("mu") * F.col("mu") + F.lit(1e-9)
        )
    )
    term = (F.col("v") - F.col("mu")) ** 2 / F.col("var")
    micro = F.round(term * 1e6).cast("bigint")
    per_vec = (
        dims.join(F.broadcast(stats), "d")
        .groupBy("vec_id")
        .agg(F.sum(micro).alias("micro"))
    )
    return (
        per_vec.orderBy(F.desc("micro"), "vec_id")
        .limit(20)
        .select(
            "vec_id",
            F.round(F.col("micro") / 1e6, 6).alias("mahal_sq"),
        )
    )


MAHALANOBIS_OUTLIERS_SQL = """
WITH xs AS (
    SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    WHERE embedding IS NOT NULL
), dims AS (
    SELECT vec_id, u.i - 1 AS d, x[u.i] AS v
    FROM xs, unnest(generate_series(1, len(x))) AS u(i)
), stats AS (
    SELECT d, ROUND(AVG(v), 6) AS mu, ROUND(AVG(v * v), 6) AS m2
    FROM dims GROUP BY d
), st AS (
    SELECT d, mu, m2 - mu * mu + 1e-9 AS var FROM stats
), per_vec AS (
    SELECT vec_id,
           SUM(CAST(ROUND(((v - mu) * (v - mu) / var) * 1000000) AS BIGINT)) AS micro
    FROM dims JOIN st USING (d)
    GROUP BY vec_id
)
SELECT vec_id, ROUND(micro / 1000000.0, 6) AS mahal_sq
FROM per_vec
ORDER BY micro DESC, vec_id
LIMIT 20
"""

QUERIES["embedding_outliers_mahalanobis"] = embedding_outliers_mahalanobis
ORACLES["embedding_outliers_mahalanobis"] = MAHALANOBIS_OUTLIERS_SQL


def ann_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension two-stage retrieval (matryoshka): coarse
    top-150 on the first 32 of 64 dims (a 2x FLOP/bandwidth cut on the
    corpus scan), exact full-dim re-rank to top-10
    (operators/similarity.py::matryoshka_topk).  Deterministic at both
    stages, so the oracle replays the same two-stage definition;
    recall vs cosine_topk asserted in tests/test_similarity.py (0.94+
    on this synthetic corpus — the WORST case: random embeddings have
    no matryoshka training, so the prefix is merely a random
    projection; MRL-trained embeddings concentrate signal up front and
    allow far smaller prefixes/candidate sets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.matryoshka_topk(
        emb, queries, k=TOPK, coarse_dims=32, candidates=150
    )


ANN_MATRYOSHKA_SQL = f"""
WITH q AS (
    SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
    FROM embeddings WHERE vec_id < {N_QUERY_VECS}
), coarse AS (
    SELECT qid, e.vec_id, qvec, e.embedding::DOUBLE[] AS cvec,
           ROUND({_COS.format(a='qvec[1:32]', b='(e.embedding::DOUBLE[])[1:32]')}, 6)
               AS coarse
    FROM q, embeddings e
    WHERE e.vec_id <> qid
), cand AS (
    SELECT qid, vec_id, qvec, cvec,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY coarse DESC, vec_id ASC) AS crk
    FROM coarse
), exact AS (
    SELECT qid, vec_id,
           ROUND({_COS.format(a='qvec', b='cvec')}, 6) AS sim
    FROM cand WHERE crk <= 150
), ranked AS (
    SELECT qid, vec_id, sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, vec_id ASC) AS rank
    FROM exact
)
SELECT qid, vec_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOPK}
"""

QUERIES["ann_matryoshka_topk"] = ann_matryoshka_topk
ORACLES["ann_matryoshka_topk"] = ANN_MATRYOSHKA_SQL


def ann_matryoshka_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe x matryoshka prefix, composed
    (operators/similarity.py::matryoshka_ivf_topk): probe the 4
    nearest of the stride-50 clusters (scan cut ~ nprobe/nclusters),
    score the probed vectors on only their first 32 of 64 dims (2x
    FLOP/bandwidth cut on every scanned row — the two devices
    MULTIPLY), two-level lossless top-100, exact full-dim re-rank to
    top-10.  Fully deterministic, so the oracle replays the composed
    definition; recall vs cosine_topk asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.matryoshka_ivf_topk(
        emb, queries, k=TOPK, centroid_stride=50, nprobe=4,
        coarse_dims=32, candidates=100,
    )


ANN_MATRYOSHKA_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0),
asg AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND({_COS.format(a='e.v', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM e, cent c
    ) WHERE rk = 1
),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}),
probes AS (
    SELECT qid, cid AS cluster FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND({_COS.format(a='q.qv', b='c.cv')}, 6) DESC,
                            c.cid ASC) AS rk
        FROM q, cent c
    ) WHERE rk <= 4
),
coarse AS (
    SELECT p.qid, a.vec_id, q.qv, e.v,
           ROUND({_COS.format(a='q.qv[1:32]', b='e.v[1:32]')}, 6) AS coarse
    FROM probes p
    JOIN asg a USING (cluster)
    JOIN e ON e.vec_id = a.vec_id
    JOIN q ON q.qid = p.qid
    WHERE a.vec_id <> p.qid
),
cand AS (
    SELECT qid, vec_id, qv, v,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY coarse DESC, vec_id ASC) AS crk
    FROM coarse
),
exact AS (
    SELECT qid, vec_id,
           ROUND({_COS.format(a='qv', b='v')}, 6) AS sim
    FROM cand WHERE crk <= 100
)
SELECT qid, vec_id, sim, CAST(rk AS INT) AS rank FROM (
    SELECT qid, vec_id, sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, vec_id ASC) AS rk
    FROM exact
) WHERE rk <= {TOPK}
"""

QUERIES["ann_matryoshka_ivf_topk"] = ann_matryoshka_ivf_topk
ORACLES["ann_matryoshka_ivf_topk"] = ANN_MATRYOSHKA_IVF_SQL
