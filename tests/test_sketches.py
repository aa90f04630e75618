"""Behavior tests for the portable HLL sketch — properties the oracle
parity check can't see: accuracy on cardinalities that exercise the
harmonic (non-small-range) branch, and the merge law that makes the
sketch usable incrementally at scale (per-shard sketches combine by
elementwise register max without re-reading data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chewdata_spark.queries.analytics import hll_estimate, hll_registers


def _keyed_range(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(F.lit("all").alias("k"), F.col("id"))


def test_hll_error_within_bound_on_harmonic_branch(spark):
    # 100k distinct ids: every register is hit, so the estimate comes
    # from the harmonic branch.  Theoretical std error ~1.04/sqrt(512)
    # = 4.6%; the md5 stream is fixed, so this is a deterministic
    # regression pin at a 3-sigma bound.
    est = hll_estimate(hll_registers(_keyed_range(spark, 0, 100_000), "k", "id"))
    row = est.collect()[0]
    assert row.n_regs == 512
    assert abs(row.hll_estimate - 100_000) / 100_000 < 0.14


def test_hll_small_range_branch_is_tight(spark):
    # 300 distinct ids: most registers empty -> Linear-Counting branch,
    # which is much tighter than the harmonic estimate down here.
    est = hll_estimate(hll_registers(_keyed_range(spark, 0, 300), "k", "id"))
    row = est.collect()[0]
    assert row.n_regs < 512
    assert abs(row.hll_estimate - 300) / 300 < 0.06


def test_hll_merge_is_elementwise_register_max(spark):
    # Two overlapping shards sketched independently, merged by
    # union + max(rho) per register, must give EXACTLY the whole-data
    # estimate — the property that lets 100 TB be sketched shard-by-
    # shard (or day-by-day) and folded without a second pass.
    whole = hll_estimate(
        hll_registers(_keyed_range(spark, 0, 20_000), "k", "id")
    ).collect()[0]
    a = hll_registers(_keyed_range(spark, 0, 12_000), "k", "id")
    b = hll_registers(_keyed_range(spark, 8_000, 20_000), "k", "id")
    merged_regs = a.unionByName(b).groupBy("key", "reg").agg(F.max("r").alias("r"))
    merged = hll_estimate(merged_regs).collect()[0]
    assert merged.hll_estimate == whole.hll_estimate
    assert merged.n_regs == whole.n_regs


def test_hll_duplicates_do_not_move_the_estimate(spark):
    # The sketch counts DISTINCT: replicating every id 5x must not
    # change a single register.
    base = _keyed_range(spark, 0, 5_000)
    dup = base.unionByName(base).unionByName(base.unionByName(base)).unionByName(base)
    e1 = hll_estimate(hll_registers(base, "k", "id")).collect()[0]
    e5 = hll_estimate(hll_registers(dup, "k", "id")).collect()[0]
    assert e1.hll_estimate == e5.hll_estimate


def test_kmv_intersection_estimates_partial_overlap(spark):
    # two 12k-element sets sharing exactly 6k elements: the KMV
    # inclusion-exclusion estimate must land near 6k (md5 stream is
    # fixed -> deterministic regression pin at a generous bound)
    from pyspark.sql.window import Window

    a = spark.range(0, 12_000).select(F.lit("a").alias("t"), F.col("id"))
    b = spark.range(6_000, 18_000).select(F.lit("b").alias("t"), F.col("id"))
    ev = a.unionByName(b)
    u = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
        .cast("double") / F.lit(float(1 << 48))
    )
    hashes = ev.select("t", u.alias("u")).distinct()
    K = 256

    def est_of(df, part):
        w = Window.partitionBy(part).orderBy("u")
        bk = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= K)
        return bk.groupBy(part).agg(
            ((F.count(F.lit(1)) - 1) / F.max("u")).alias("e")
        ).collect()[0]["e"]

    ea = est_of(hashes.filter("t = 'a'"), "t")
    eb = est_of(hashes.filter("t = 'b'"), "t")
    merged = hashes.select("u").distinct().select(F.lit("u").alias("g"), "u")
    eu = est_of(merged, "g")
    inter = ea + eb - eu
    assert abs(ea - 12_000) / 12_000 < 0.15
    assert abs(eu - 18_000) / 18_000 < 0.15
    assert abs(inter - 6_000) / 6_000 < 0.45  # differences amplify sketch noise
