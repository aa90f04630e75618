"""Deduplication operators for large-scale corpus curation.

Beyond the reference surface (chewdata has no dedup); designed for the
100 TB training-data use case:

- :func:`exact_dedup` — hash-groupBy; one shuffle on the content hash.
- :func:`minhash_signatures` / :func:`minhash_candidate_pairs` —
  MinHash + LSH banding.  Shingles are produced by posexplode + window
  ``lead`` (whole-stage codegen; higher-order ``transform`` lambdas are
  interpreted and measured ~10× slower), signatures by a groupBy with
  ``num_perm`` min aggregates that reuses the window's id-partitioning
  (no extra shuffle), then one shuffle on (band_idx, band_hash)
  surfaces candidates.  Cost: O(rows x num_perm) map-side + a
  bucket-join whose skew AQE splits.
- :func:`simhash64` / :func:`simhash_candidate_pairs` — 64-bit SimHash
  with banded bucketing + ``bit_count`` Hamming verification.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via shingle
  self-join (quadratic in bucket size; use for verification / small
  buckets — MinHash is the at-scale front-end).

All functions are pure DataFrame transformations (no collect), with
ONE documented exception: :func:`simhash_candidate_pairs` runs a
bounded 256-fingerprint degeneracy probe EAGERLY at plan construction
(skipped for streaming inputs) — see its docstring for why the check
cannot ride in the plan.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# observe() names must be unique within one query plan; a query that
# composes two capped LSH calls (e.g. consensus dedup) would otherwise
# collide.  Deterministic within a session; no wall-clock involved.
_OBS_SEQ = itertools.count()


def _word_shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles of ``text`` as one array column.

    Kept for small inputs / array-shaped callers; the hot path uses
    :func:`_shingle_rows` (codegen) instead of this interpreted HOF.
    Texts shorter than n words yield the whole text as one shingle.
    """
    words = F.split(F.lower(text), r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, s) rows: one word n-gram shingle per row (with duplicates).

    posexplode(split) + window lead() — stays in whole-stage codegen,
    and the window's hash-partitioning on id is reused by downstream
    groupBy(id) aggregations (no second shuffle).  Semantics match
    :func:`_word_shingles`: docs shorter than n words produce one
    whole-text shingle.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "w"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    leads = [F.lead("w", i).over(w) for i in range(1, n)]
    last_lead = leads[-1] if leads else None
    sh = ex.withColumn("s", F.concat_ws(" ", F.col("w"), *leads))
    if last_lead is not None:
        sh = sh.withColumn("_last", F.lead("w", n - 1).over(w)).filter(
            F.col("_last").isNotNull() | (F.col("pos") == 0)
        )
    return sh.select("id", "s")


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


_MERSENNE31 = 2147483647  # 2^31 - 1, prime


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine permutation coefficients (a, b), a != 0."""
    import random

    rng = random.Random(0x5EED)
    return [(rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31)) for _ in range(num_perm)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, shingles, sig: array<bigint>[num_perm]).

    Computed as explode(shingles) → one xxhash64 per shingle → groupBy
    id with ``num_perm`` min-of-affine-permutation aggregates.  All
    codegen'd with map-side partial aggregation; the only shuffle is the
    groupBy on id (near-uniform key).  This beats per-row higher-order
    ``transform`` lambdas ~10× — HOF lambdas evaluate interpreted.

    Permutations are ``(a_j * h + b_j) mod (2^31-1)`` over the 31-bit
    reduced xxhash64 — stays within long range under ANSI mode (Spark 4
    default) where 64-bit overflow would throw.

    The shingle *set* rides along via collect_set in the same aggregate
    (needed later only for candidate verification).
    """
    ex = _shingle_rows(df, id_col, text_col, shingle_size).withColumn(
        "h", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE31))
    )
    params = _perm_params(num_perm)
    aggs = [
        F.min(F.pmod(F.col("h") * a + b, F.lit(_MERSENNE31))).alias(f"m{j}")
        for j, (a, b) in enumerate(params)
    ]
    return ex.groupBy("id").agg(*aggs, F.collect_set("s").alias("shingles")).select(
        "id",
        "shingles",
        F.array(*[F.col(f"m{j}") for j in range(num_perm)]).alias("sig"),
    )


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 32,
    shingle_size: int = 3,
) -> DataFrame:
    """Cross-engine-reproducible MinHash: permutation ``j``'s hash is
    ``md5(j || '|' || shingle)`` and the signature element is the
    lexicographic MIN of the hex digest.

    md5 produces the identical lowercase hex string in every engine, so
    a SQL oracle (DuckDB/Trino/Postgres) recomputes the signature — and
    therefore the exact LSH candidate set — verbatim, unlike the
    xxhash64-seeded :func:`minhash_signatures` fast path.  The plan
    shape is the same: codegen shingle rows, one groupBy(id) shuffle
    carrying ``num_perm`` min aggregates with map-side partial
    aggregation.  Hex-string signatures shuffle 32 bytes/perm instead
    of 8 — use this as the verification twin, the xxhash64 path at
    scale.
    """
    ex = _shingle_rows(df, id_col, text_col, shingle_size).dropDuplicates(["id", "s"])
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(j)), F.col("s")))).alias(f"m{j}")
        for j in range(num_perm)
    ]
    return ex.groupBy("id").agg(*aggs, F.collect_set("s").alias("shingles")).select(
        "id",
        "shingles",
        F.array(*[F.col(f"m{j}") for j in range(num_perm)]).alias("sig"),
    )


def minhash_candidate_pairs(
    sigs: DataFrame,
    *,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 10_000,
    metric: str = "jaccard",
) -> DataFrame:
    """LSH banding → candidate pairs → exact-Jaccard verification.

    ``metric='containment'`` verifies with the asymmetric containment
    coefficient ``|A∩B| / min(|A|,|B|)`` instead of Jaccard — the
    measure that catches a short document embedded inside a long one
    (quote/boilerplate inclusion), which Jaccard's union denominator
    dilutes below any usable threshold; the output column is then
    ``containment``.

    Plan shape: explode bands (map-side), ONE shuffle on
    (band_idx, band_hash) into a collect_set-per-bucket, pairs exploded
    from each bucket's id set — not a bucket self-join, which would
    evaluate the whole signature pipeline a second time as the join's
    other side (measured: one fewer scan+window+aggregate pass).  Then
    verify with ``array_intersect`` on the retained shingle arrays.
    Output: (id_a, id_b, jaccard) with id_a < id_b, deduplicated across
    bands.

    A pathologically hot bucket (a low-entropy band over boilerplate-
    heavy shards) concentrates one aggregation buffer AND |bucket|²
    exploded pairs on one task.  Buckets with more than ``max_bucket``
    ids are DROPPED before the pair explode — a bucket that hot is not
    discriminating (its members collide on other bands too if truly
    near-dup, and a 10k-id bucket already means ~50M pairs).  The cap
    is NOT silent: the plan carries an ``observe`` metric
    ``minhash_lsh_<n>/dropped_hot_buckets`` (count of capped buckets, free
    at execution — no extra job) and the behavior is pinned in
    tests/test_dedup_recall.py.  Pass ``max_bucket=None`` to disable.
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
    # Bucket rows carry only (id, band) — the shingle arrays would
    # multiply shuffle volume by `bands`; they're joined back for
    # verification only on the (small) candidate set.
    buckets = sigs.select("id", F.explode(band_cols).alias("band")).select(
        "id", "band.band_idx", "band.band_hash"
    )
    bucket_ids = (
        buckets.groupBy("band_idx", "band_hash")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        bucket_ids = bucket_ids.observe(
            f"minhash_lsh_{next(_OBS_SEQ)}",
            F.sum(
                F.when(F.size("ids") > max_bucket, 1).otherwise(0)
            ).alias("dropped_hot_buckets"),
        ).filter(F.size("ids") <= max_bucket)
    pairs = (
        bucket_ids.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verify with ONE probe of the shingle relation: exploding each pair
    # into two (pair, id) rows and regrouping costs one candidate-sized
    # shuffle, where joining sh twice (once per side) would execute the
    # whole signature pipeline a second time.
    sh = sigs.select("id", "shingles")
    sides = pairs.select("id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("id"))
    verified = (
        sides.join(sh, "id")
        .groupBy("id_a", "id_b")
        .agg(
            F.first(F.when(F.col("id") == F.col("id_a"), F.col("shingles")), ignorenulls=True).alias("sh_a"),
            F.first(F.when(F.col("id") == F.col("id_b"), F.col("shingles")), ignorenulls=True).alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    if metric == "containment":
        denom = F.least(F.size("sh_a"), F.size("sh_b"))
        out_col = "containment"
    elif metric == "jaccard":
        denom = F.size("sh_a") + F.size("sh_b") - inter
        out_col = "jaccard"
    else:
        raise ValueError(f"metric must be 'jaccard' or 'containment', got {metric!r}")
    return (
        verified.withColumn(out_col, F.round(inter / denom, 6))
        .filter(F.col(out_col) >= jaccard_threshold)
        .select("id_a", "id_b", out_col)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens, fully JVM-side.

    bit i of the fingerprint = sign of sum over tokens of
    (2*bit_i(xxhash64(token)) - 1).  Each bit-sum is an
    ``aggregate`` over the token-hash array — 64 expressions, one
    projection, no shuffle.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    aggs = [
        F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
        for i in range(64)
    ]
    sums = ex.groupBy("id").agg(*aggs)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        piece = F.shiftleft(bit, i)
        fp = piece if fp is None else fp.bitwiseOR(piece)
    return sums.select("id", fp.alias("simhash"))


def simhash_portable(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash whose per-token hash bits come from the md5 hex
    digest — bit-identical in every engine with md5, so a SQL oracle
    reproduces the fingerprints (and the banded candidate pairs)
    verbatim, unlike the xxhash64 :func:`simhash64` fast path.

    bit i = sign of sum over distinct tokens of (2*b_i - 1), where b_i
    is bit (3 - i%4) of hex digit i//4 of md5(token).  Same plan shape
    as :func:`simhash64`: one projection per token row, 32 codegen'd
    sum aggregates, one groupBy(id) shuffle, no collect.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("t"),
    ).withColumn("h", F.md5("t"))
    aggs = []
    for i in range(32):
        p, shift = i // 4 + 1, 3 - (i % 4)
        dv = F.expr(f"instr('0123456789abcdef', substr(h, {p}, 1)) - 1")
        bit = F.shiftright(dv, shift).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"b{i}"))
    sums = ex.groupBy("id").agg(*aggs)
    fp = None
    for i in range(32):
        bit = (
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        piece = F.shiftleft(bit, i)
        fp = piece if fp is None else fp.bitwiseOR(piece)
    return sums.select("id", fp.alias("simhash"))


def simhash_candidate_pairs(
    fps: DataFrame,
    *,
    bands: int = 4,
    max_hamming: int = 3,
    bits: int = 64,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Band the ``bits``-bit fingerprint into ``bands`` chunks; exact
    match on any chunk → candidate; verify with ``bit_count(a XOR b)``.

    Plan shape mirrors :func:`minhash_candidate_pairs`: ONE shuffle on
    (band_idx, band_val) into a collect_set per bucket, pairs exploded
    from each bucket's (id, fp) set — not a bucket self-join, which
    would execute the whole fingerprint pipeline a second time as the
    join's other side (measured ~2.5× on the md5 twin at sf0.1).

    Guards: (1) fingerprints are asserted to FIT ``bits`` — a 32-bit
    :func:`simhash_portable` fingerprint banded with the default
    bits=64 would leave the upper bands constant zero and put every
    document in one bucket (silent O(n²) blowup); the misfit now raises
    at execution.  (2) Buckets with more than ``max_bucket`` members
    are dropped before the quadratic pair explode (hot low-entropy band
    values otherwise concentrate the whole bucket and its |bucket|²
    pairs on one task); the cap is surfaced as an ``observe`` metric
    ``simhash_lsh_<n>/dropped_hot_buckets`` — never silent.  Pass
    ``max_bucket=None`` to disable."""
    width = bits // bands
    mask = (1 << width) - 1
    top_shift = bits - width
    if top_shift > 0:
        # the OPPOSITE misfit — a family NARROWER than `bits` (the
        # classic trap: 32-bit simhash_portable banded with the default
        # bits=64) — leaves the top band constant zero and one bucket
        # swallows the corpus.  Per-row checks can't see it (a narrow
        # value never "exceeds" bits), so probe a 256-fingerprint
        # sample: all non-negative and below 2^(bits - width) ⇒ the top
        # band is all-zero ⇒ raise.  False-positive odds for a genuine
        # bits-wide family: (2^-width)^256 — nil.  The probe runs
        # EAGERLY at plan-construction (one bounded job): riding it in
        # the query as a crossJoin'd assert would re-execute the full
        # fingerprint pipeline on every run (measured +0.5 s/run at
        # sf0.1), where the eager form prices it once per plan build.
        # skipped for streaming inputs (no eager job possible) and for
        # corpora under 16 fingerprints, where a genuine bits-wide
        # family could plausibly have an all-zero top band by chance
        # ((2^-width)^n is no longer negligible at tiny n) — and where
        # the quadratic blowup the guard prevents is harmless anyway
        probe = (
            None
            if fps.isStreaming
            else fps.select("simhash")
            .limit(256)
            .agg(
                F.max("simhash").alias("mx"),
                F.min("simhash").alias("mn"),
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("simhash").alias("nd"),
            )
            .first()
        )
        # nd >= 16 guards the degenerate-corpus false positive: a
        # near-dup-dominated sample is CORRELATED (256 copies of a few
        # fingerprints), so the (2^-width)^256 independence bound
        # doesn't hold — one unlucky shared fingerprint with an
        # all-zero top band would mislabel a genuine bits-wide family.
        # With >= 16 distinct values the bound is (2^-width)^16 — still
        # nil for any real width.
        if (
            probe is not None
            and probe["mx"] is not None
            and probe["n"] >= 16
            and probe["nd"] >= 16
            and probe["mn"] >= 0
            and probe["mx"] < (1 << top_shift)
        ):
            raise ValueError(
                f"simhash fingerprints all fit below 2^{top_shift} — "
                f"bits={bits} overstates the hash family's width (e.g. "
                "pass bits=32 for simhash_portable); banding would "
                "degenerate to one bucket.  (If this corpus genuinely "
                "hashes with a bits-wide family, it is fingerprint-"
                "degenerate — nearly all duplicates — and the banding "
                "would one-bucket it regardless; dedup by exact hash "
                "first.)"
            )
    if bits < 64:
        # loud failure instead of silent one-bucket degeneration: the
        # assert rides a filter (assert_true → NULL on success, raise on
        # misfit) so Catalyst cannot prune it
        fit = F.assert_true(
            F.shiftright(F.col("simhash"), bits) == 0,
            F.lit(
                f"simhash fingerprint exceeds bits={bits}: pass the "
                "fingerprint's actual width (e.g. bits=32 for "
                "simhash_portable)"
            ),
        )
        fps = fps.filter(fit.isNull())
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
    bucket_sets = (
        buckets.groupBy("band_idx", "band_val")
        .agg(F.collect_set(F.struct("id", "simhash")).alias("xs"))
        .filter(F.size("xs") >= 2)
    )
    if max_bucket is not None:
        bucket_sets = bucket_sets.observe(
            f"simhash_lsh_{next(_OBS_SEQ)}",
            F.sum(
                F.when(F.size("xs") > max_bucket, 1).otherwise(0)
            ).alias("dropped_hot_buckets"),
        ).filter(F.size("xs") <= max_bucket)
    pairs = (
        bucket_sets.select(F.explode("xs").alias("a"), F.col("xs"))
        .select("a", F.explode("xs").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


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
    The self-join keys on xxhash64(shingle) (8-byte shuffle keys instead
    of strings; collision odds ~(distinct shingles)²/2^65, negligible).
    """
    exploded = (
        _shingle_rows(df, id_col, text_col, n)
        .dropDuplicates(["id", "s"])
        .select("id", F.xxhash64("s").alias("sh"))
        .withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    # filter on the UNROUNDED ratio (matching the oracle's WHERE and the
    # prefix twin's completeness guarantee, which covers true-Jaccard
    # >= t only); round solely in the projected output column
    return (
        inter.filter(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via PPJoin-style prefix filtering —
    the sub-quadratic production twin of :func:`ngram_jaccard_pairs`.

    Same output, different candidate generation (Xiao et al., "Efficient
    Similarity Joins for Near Duplicate Detection", WWW 2008 — public):

    1. order each doc's distinct shingles by GLOBAL document frequency
       ascending (rarest first, shingle-hash tie-break — any shared
       deterministic total order works);
    2. keep only the first ``p = |x| - ceil(t*|x|) + 1`` shingles per
       doc (Jaccard >= t implies intersection >= ceil(t*|x|), so two
       qualifying docs MUST share a token inside both prefixes);
    3. self-join prefixes on the shingle hash with the length filter
       ``min(n_a,n_b) >= t * max(n_a,n_b)`` (Jaccard >= t bounds the
       size ratio), distinct the candidate id pairs;
    4. verify exactly: join back to the per-doc sorted shingle arrays
       and count ``array_intersect``.

    Why this scales where the inverted-index join doesn't: the plain
    shingle self-join explodes on STOP-WORD shingles ("of the and"
    appears in k docs -> k^2/2 join rows), while the prefix join only
    keys on each doc's RAREST shingles — a ubiquitous shingle ranks
    last and never enters any prefix unless the doc is nearly all
    stop-words.  Candidate count is near-linear on real corpora; the
    verify step is one broadcast-free pair join against arrays already
    grouped per doc.  No cap, no recall loss: output is bit-identical
    to the quadratic twin (asserted in tests and by sharing its oracle).
    """
    sh = (
        _shingle_rows(df, id_col, text_col, n)
        .dropDuplicates(["id", "s"])
        .select("id", F.xxhash64("s").alias("sh"))
    )
    # Global rarity rank via groupBy + join, NOT a Window.partitionBy
    # ("sh"): the window has no map-side partial aggregation, so a
    # stop-shingle's every row would funnel through one task before the
    # prefix filter can drop it.  The aggregate combines map-side to one
    # row per shingle, and the re-join on sh is AQE-skew-splittable.
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    freq = sh.join(df_counts, "sh")
    wdoc = Window.partitionBy("id").orderBy("df", "sh")
    ranked = (
        freq.withColumn("rk", F.row_number().over(wdoc))
        .withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = ranked.filter(F.col("rk") <= prefix_len).select("id", "sh", "n_sh")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= F.lit(threshold) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = ranked.groupBy("id").agg(
        F.sort_array(F.collect_list("sh")).alias("arr"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    verified = (
        cand.join(sets.select(F.col("id").alias("id_a"),
                              F.col("arr").alias("arr_a"),
                              F.col("n_sh").alias("n_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"),
                          F.col("arr").alias("arr_b"),
                          F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    # unrounded filter, like the quadratic twin: the prefix filter only
    # guarantees candidates for TRUE Jaccard >= t, so filtering on
    # ROUND(j,6) would admit [t-5e-7, t) pairs in the quadratic twin
    # that this path can legitimately miss
    return (
        verified.filter(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("id_a", "id_b", "jaccard")
    )


def positional_grams(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, pos, g) rows: the word k-gram starting at 0-based token
    position ``pos`` — one row per valid start (docs shorter than k
    words yield nothing).  Same codegen shape as :func:`_shingle_rows`
    (posexplode + window ``lead``); downstream per-doc windows reuse
    the id hash-partitioning.
    """
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "w"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("w", i).over(w) for i in range(1, k)]
    return (
        ex.withColumn("g", F.concat_ws(" ", F.col("w"), *leads))
        .withColumn("_last", F.lead("w", k - 1).over(w) if k > 1 else F.col("w"))
        .filter(F.col("_last").isNotNull())
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "g")
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 8
) -> DataFrame:
    """Exact duplicated-substring spans: every maximal token span whose
    k-grams each appear in MORE THAN ONE document — the span-level
    exact dedup of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (suffix-array substring dedup), re-expressed
    relationally.

    Plan at 100 TB: positional k-grams (codegen, one window), duplicated
    grams via the two-step distinct-doc count (groupBy (hash, doc) with
    map-side combine, then groupBy hash — no count-distinct shuffle
    blowup), a semi-join back onto the gram stream (AQE broadcasts the
    dup-gram side when it fits — duplicated grams are the rare case),
    then per-doc gaps-and-islands to merge overlapping hits into maximal
    spans.  Gram keys travel as md5 (16 bytes, engine-portable), never
    the gram text.

    Returns (doc_id, span_start, span_end, span_tokens) with token
    positions 0-based inclusive.
    """
    grams = positional_grams(df, id_col, text_col, k).select(
        "doc_id", "pos", F.md5("g").alias("gh")
    )
    dup = (
        grams.select("gh", "doc_id")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gh")
    )
    hits = grams.join(dup, "gh").select("doc_id", "pos")
    # r15 (guide §2.4, same device as suffix.py::_merge_islands): the
    # island facts all come out of the ONE (doc_id, pos) window sort —
    # span_start is the running max of island-START positions (ordered
    # by pos, the latest start IS the current island's min), the
    # island's max pos is simply the pos of its LAST row, and a row is
    # last when lead(_new) is 1 or NULL.  The former
    # groupBy(doc_id, _island) re-exchanged every hit by a different
    # key right after the window's own exchange.
    w = Window.partitionBy("doc_id").orderBy("pos")
    upto = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = hits.withColumn("_prev", F.lag("pos").over(w)).withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k), 1
        ).otherwise(0),
    )
    spans = flagged.select(
        "doc_id",
        F.max(F.when(F.col("_new") == 1, F.col("pos")))
        .over(upto)
        .alias("span_start"),
        # the when() keeps span_end NULLABLE like the old aggregate
        # output — the declared schema is part of the query contract
        F.when(F.col("pos").isNotNull(), F.col("pos") + (k - 1)).alias(
            "span_end"
        ),
        F.lead("_new").over(w).alias("_nxt"),
    )
    return spans.filter(
        F.col("_nxt").isNull() | (F.col("_nxt") == 1)
    ).select(
        "doc_id",
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
    )


def dedup_lines_global(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 5,
) -> DataFrame:
    """Corpus-global line deduplication (the C4/FineWeb preprocessing
    step): every duplicated line keeps its FIRST occurrence (ordered by
    (doc_id, line position)) and disappears everywhere else; documents
    are reassembled from their surviving lines.  Lines shorter than
    ``min_words`` words never participate — they are kept verbatim
    (removing every repeated blank/short line would shred documents).

    Scale shape: posexplode lines → one shuffle on the normalized line
    hash (16-byte md5 keys) for the first-occurrence row_number →
    groupBy doc to reassemble (reuses nothing from the line-hash
    partitioning, so two shuffles total — both map-side combinable;
    near-uniform keys, no skew: the heaviest possible line-hash group
    is the most-duplicated line, and those rows collapse to rank
    comparisons, not data).

    Returns (doc_id, clean_text, n_lines, n_dropped).
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    eligible = (
        F.size(F.split(F.trim(F.col("line")), r"\s+")) >= min_words
    ) & (F.trim(F.col("line")) != "")
    # ineligible lines NEVER enter the line-hash window — putting them
    # all in one NULL partition would be a single-task sort of every
    # short/blank line in the corpus
    ranked_elig = (
        lines.filter(eligible)
        .withColumn("_lh", F.md5(F.trim(F.lower(F.col("line")))))
        .withColumn(
            "_rank",
            F.row_number().over(Window.partitionBy("_lh").orderBy("doc_id", "pos")),
        )
        .drop("_lh")
    )
    ranked = ranked_elig.unionByName(
        lines.filter(~eligible).withColumn("_rank", F.lit(1))
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_rank") == 1, F.struct("pos", "line"))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_rank") > 1, 1).otherwise(0)).alias("n_dropped"),
        )
        .select("doc_id", "clean_text", "n_lines", "n_dropped")
    )


def dedup_lines_within_doc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 5,
) -> DataFrame:
    """Intra-document repeated-line removal (the C4 "three-sentence /
    repeated-line" rule applied per document): a line that occurs more
    than once *within the same document* keeps only its first
    occurrence; other documents are unaffected.  Complements
    :func:`dedup_lines_global` (nav bars / boilerplate repeated inside
    one page vs. across the corpus).  Lines shorter than ``min_words``
    words are kept verbatim — every occurrence.

    Scale shape: one window shuffle keyed on (doc_id, line-hash) — the
    doc_id component makes partitions bounded by document size, so no
    corpus-wide hot key is possible — then a groupBy(doc_id) reassembly.
    Both shuffles are map-side combinable and near-uniform.

    Returns (doc_id, clean_text, n_lines, n_dropped).
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    eligible = (
        F.size(F.split(F.trim(F.col("line")), r"\s+")) >= min_words
    ) & (F.trim(F.col("line")) != "")
    # one unified window is safe here (unlike the global variant): the
    # partition key includes doc_id, so ineligible lines cannot create
    # a corpus-sized partition, and they can't share a hash with an
    # eligible line (eligibility is a function of the line text).
    ranked = lines.withColumn("_elig", eligible).withColumn(
        "_rank",
        F.row_number().over(
            Window.partitionBy(
                "doc_id", F.md5(F.trim(F.lower(F.col("line"))))
            ).orderBy("pos")
        ),
    )
    keep = (F.col("_rank") == 1) | ~F.col("_elig")
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "line")))
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~keep, 1).otherwise(0)).alias("n_dropped"),
        )
        .select("doc_id", "clean_text", "n_lines", "n_dropped")
    )


def cut_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 8
) -> DataFrame:
    """Deduplicating REMOVAL half of the Lee et al. pipeline
    (:func:`duplicate_spans` is the detection half): every k-gram
    occurrence that is not the corpus-global FIRST occurrence of that
    gram (ordered by (doc_id, position), the same rule as
    :func:`dedup_lines_global`) marks its k tokens for removal;
    documents reassemble from the surviving tokens.  Deterministic and
    well-defined — no arbitrary "keep one copy" tie-break.

    Scale shape: one positional-gram pass, one row_number shuffle on
    the 16-byte gram hash, a k-fold position explode of ONLY the cut
    hits (duplicated grams are the rare case), a left-anti join per
    (doc, pos) that reuses the token stream, and the per-doc
    reassembly groupBy.

    Returns (doc_id, clean_text, n_tokens, n_cut).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "w"
        ),
    ).withColumn("pos", F.col("pos").cast("bigint"))
    grams = positional_grams(df, id_col, text_col, k).select(
        "doc_id", "pos", F.md5("g").alias("gh")
    )
    ranked = grams.withColumn(
        "_rank",
        F.row_number().over(Window.partitionBy("gh").orderBy("doc_id", "pos")),
    )
    covered = (
        ranked.filter(F.col("_rank") > 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    n_toks = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(n_toks, "doc_id", "right")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_cut"),
        )
    )


def two_sided_signatures(
    a_df: DataFrame,
    b_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    portable: bool = False,
    num_perm: int = 64,
    shingle_size: int = 3,
    tags: tuple[str, str] = ("n", "s"),
) -> tuple[DataFrame, DataFrame]:
    """ONE MinHash signature pass over two relations: tag each row's id
    with its side, union, sign once, split back — the tokenize → window
    → num_perm min-aggs chain executes once instead of once per side
    (measured ~1.7× on the md5 family at sf0.1; the signature pipeline
    dominates, not the joins).  The shared signature relation is lazily
    ``localCheckpoint``'ed because both sides' band explodes AND both
    sides' verification joins read it — at production scale this is the
    persisted signature table kept between runs.  Ids come back in
    their original type.  Shared by :func:`incremental_ingest_dedup`
    and the contamination-ranking query."""
    sig_fn = minhash_signatures_portable if portable else minhash_signatures
    id_type = dict(a_df.dtypes)[id_col]
    ta, tb = tags

    def _tag(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.concat_ws("#", F.lit(side), F.col(id_col).cast("string")).alias(
                "__tid"
            ),
            F.col(text_col),
        )

    tagged = _tag(a_df, ta).unionByName(_tag(b_df, tb))
    sigs_all = sig_fn(
        tagged, "__tid", text_col, num_perm=num_perm, shingle_size=shingle_size
    ).localCheckpoint(eager=False)

    def _side(side: str) -> DataFrame:
        # strip by tag length, not a hardcoded offset — a multi-char
        # tag would otherwise leave residue in the restored id
        return sigs_all.filter(F.col("id").startswith(side + "#")).withColumn(
            "id", F.expr(f"substring(id, {len(side) + 2})").cast(id_type)
        )

    return _side(ta), _side(tb)


def incremental_ingest_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_size: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """Daily-ingest deduplication: drop arriving documents that are
    exact OR near duplicates of the EXISTING corpus — the incremental
    form every production pipeline actually runs (re-clustering the
    full corpus per ingest would be quadratic in history).
    ``portable=True`` swaps in the md5-seeded
    :func:`minhash_signatures_portable` family so a SQL oracle can
    reproduce the run bit-for-bit (use 32/16 perms/bands there).

    Two gates, cheapest first:
    1. exact — anti-join of md5(text) against the seen hash set (one
       16-byte-key shuffle; at scale the seen side is a bucketed hash
       table on disk, here a DataFrame);
    2. near — MinHash band buckets of the exact-survivors probe the
       seen side's buckets (signatures on BOTH sides, one (band, hash)
       shuffle), candidates verify with exact shingle Jaccard, and
       confirmed near-dups drop via anti-join.

    New-vs-new duplicates are deliberately kept (they form tomorrow's
    "seen" cluster) — matching how incremental pipelines stay
    idempotent per batch.  Returns the surviving new rows.
    """
    seen_hashes = seen_df.select(F.md5(F.col(text_col)).alias("_h")).distinct()
    new_hashed = new_df.withColumn("_h", F.md5(F.col(text_col)))
    exact_survivors = new_hashed.join(seen_hashes, "_h", "left_anti").drop("_h")

    new_sigs, seen_sigs = two_sided_signatures(
        exact_survivors.select(id_col, text_col),
        seen_df,
        id_col,
        text_col,
        portable=portable,
        num_perm=num_perm,
        shingle_size=shingle_size,
    )
    rows_per_band = num_perm // bands

    def band_rows(sigs, idn):
        # ids only through the ×bands explode — shingle arrays would
        # multiply shuffle volume by `bands`; they join back onto the
        # (small) candidate set for verification
        cols = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.xxhash64(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band)
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ]
        )
        return sigs.select(
            F.col("id").alias(idn), F.explode(cols).alias("band")
        ).select(idn, "band.band_idx", "band.band_hash")

    cand = (
        band_rows(new_sigs, "new_id")
        .join(band_rows(seen_sigs, "seen_id"), ["band_idx", "band_hash"])
        .dropDuplicates(["new_id", "seen_id"])
        .join(
            new_sigs.select(F.col("id").alias("new_id"), F.col("shingles").alias("new_sh")),
            "new_id",
        )
        .join(
            seen_sigs.select(F.col("id").alias("seen_id"), F.col("shingles").alias("seen_sh")),
            "seen_id",
        )
    )
    inter = F.size(F.array_intersect("new_sh", "seen_sh"))
    union = F.size("new_sh") + F.size("seen_sh") - inter
    confirmed = cand.filter(
        F.round(inter / union, 6) >= jaccard_threshold
    ).select(F.col("new_id").alias(id_col)).distinct()
    return exact_survivors.join(confirmed, id_col, "left_anti")


def cdc_chunks(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    gram: int = 4,
    modulus: int = 32,
) -> "DataFrame":
    """Content-defined chunking (the rolling-hash boundary device of
    LBFS/restic/Borg, at word grain): a boundary falls after any token
    whose trailing ``gram``-token window hashes to 0 mod ``modulus``
    (expected chunk ≈ ``modulus`` tokens).  Boundaries move WITH the
    content, so an insertion near the start re-aligns and every later
    chunk still carries the same hash — the property fixed-size
    blocking loses (pinned in tests/test_span_winnowing.py).

    Returns (doc_id, chunk_id, chash, n_toks).  Plan: token explode →
    per-doc lag window (partitions bounded by document length) → one
    chunk-grain groupBy; the md5 coin and ordered join make the chunk
    relation engine-portable."""
    from pyspark.sql.window import Window

    from chewdata_spark.operators.curation import md5_hex16

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lags = [F.lag("tok", j).over(w) for j in range(gram - 1, 0, -1)]
    gram_str = F.concat_ws(" ", *lags, F.col("tok"))
    boundary = (
        (F.col("pos") >= gram - 1) & (md5_hex16(gram_str) % modulus == 0)
    ).cast("int")
    w_prev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = toks.select(
        "doc_id", "pos", "tok", boundary.alias("b")
    ).select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum("b").over(w_prev), F.lit(0)).alias("chunk_id"),
    )
    return chunked.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x.tok,
                ),
                " ",
            )
        ).alias("chash"),
        F.count(F.lit(1)).alias("n_toks"),
    )
