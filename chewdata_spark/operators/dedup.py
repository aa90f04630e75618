"""Deduplication operators for large-scale corpus curation.

Beyond the reference surface (chewdata has no dedup); designed for the
100 TB training-data use case:

- :func:`exact_dedup` — hash-groupBy; one shuffle on the content hash.
- :func:`minhash_signatures` / :func:`minhash_candidate_pairs` —
  MinHash + LSH banding.  Signatures are computed entirely JVM-side
  (``transform``/``array_min`` over the shingle array — no Python, no
  explode), then ONE shuffle on (band_idx, band_hash) surfaces
  candidates.  This is the canonical scale path: cost is
  O(rows x num_perm) map-side + a bucket-join whose skew AQE splits.
- :func:`simhash64` / :func:`simhash_candidate_pairs` — 64-bit SimHash
  with banded bucketing + ``bit_count`` Hamming verification.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via shingle
  self-join (quadratic in bucket size; use for verification / small
  buckets — MinHash is the at-scale front-end).

All functions are pure DataFrame transformations (no collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles of ``text``, JVM-side.

    split → sliding slices via ``transform(sequence(...))`` — no UDF.
    Texts shorter than n words yield the whole text as one shingle.
    """
    words = F.split(F.lower(text), r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Keep the min-id representative per exact content hash.

    One shuffle on the md5 of the content; at scale the hash groupBy is
    near-uniform (no skew) and partially aggregated map-side.
    """
    content = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])
    return (
        df.withColumn("content_hash", F.md5(content))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, shingles, sig: array<bigint>[num_perm]).

    Permutation j is ``min over shingles of xxhash64(shingle, j)`` —
    64-bit hashing with per-permutation seeds, computed by
    ``array_min(transform(...))`` so the whole signature is one
    codegen'd projection.
    """
    sh = _word_shingles(F.col(text_col), shingle_size)
    out = df.select(F.col(id_col).alias("id"), sh.alias("shingles"))

    def perm_min(j: int) -> Column:
        # Single-arg lambda: a two-arg lambda would make PySpark bind the
        # second parameter to the array index, shadowing the seed.
        return F.array_min(F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(j))))

    sig = F.array(*[perm_min(j) for j in range(num_perm)])
    return out.withColumn("sig", sig)


def minhash_candidate_pairs(
    sigs: DataFrame,
    *,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """LSH banding → candidate pairs → exact-Jaccard verification.

    Plan shape: explode bands (map-side), shuffle once on
    (band_idx, band_hash), self-join within buckets, then verify with
    ``array_intersect`` on the retained shingle arrays.  Output:
    (id_a, id_b, jaccard) with id_a < id_b, deduplicated across bands.
    """
    rows_per_band = num_perm // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select("id", "shingles", F.explode(band_cols).alias("band")).select(
        "id", "shingles", "band.band_idx", "band.band_hash"
    )
    left = buckets.alias("a")
    right = buckets.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens, fully JVM-side.

    bit i of the fingerprint = sign of sum over tokens of
    (2*bit_i(xxhash64(token)) - 1).  Each bit-sum is an
    ``aggregate`` over the token-hash array — 64 expressions, one
    projection, no shuffle.
    """
    tokens = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    out = df.select(F.col(id_col).alias("id"), hashes.alias("th"))

    def bit_term(i: int) -> Column:
        # Two-arg merge lambda only — extra defaulted params would be
        # misread by PySpark as additional lambda variables.
        return F.aggregate(
            "th",
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    bit_terms = [bit_term(i) for i in range(64)]
    fp = None
    for i, term in enumerate(bit_terms):
        bit = F.when(term > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        piece = F.shiftleft(bit, i)
        fp = piece if fp is None else fp.bitwiseOR(piece)
    return out.select("id", fp.alias("simhash"))


def simhash_candidate_pairs(
    fps: DataFrame, *, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Band the 64-bit fingerprint into ``bands`` chunks; exact match on
    any chunk → candidate; verify with ``bit_count(a XOR b)``."""
    width = 64 // bands
    mask = (1 << width) - 1
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    buckets = fps.select("id", "simhash", F.explode(band_cols).alias("band")).select(
        "id", "simhash", "band.band_idx", "band.band_val"
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard via shingle self-join (id_a < id_b).

    Quadratic in shingle-bucket size — correct but not the scale path;
    front it with :func:`minhash_candidate_pairs` beyond ~1M docs.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        _word_shingles(F.col(text_col), n).alias("shingles"),
    )
    exploded = sh.select("id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
