"""Skew/salting equivalence + bucketed shuffle-free join plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chewdata_spark.operators.skew import (
    bucketed_join,
    salted_join,
    salted_sum_count,
    write_bucketed,
)
from chewdata_spark.plans.inspection import exchange_count
from chewdata_spark.tables import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_sum_count(
        li, ["l_returnflag"], {"qty": "sum:l_quantity", "n": "count:*", "mx": "max:l_extendedprice"}
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n"),
        F.max("l_extendedprice").alias("mx"),
    )
    s = {r.l_returnflag: (round(r.qty, 6), r.n, r.mx) for r in salted.collect()}
    p = {r.l_returnflag: (round(r.qty, 6), r.n, r.mx) for r in plain.collect()}
    assert s == p


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = salted_join(li, orders, "l_orderkey", num_salts=8)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    s = salted.groupBy("o_orderstatus").count().collect()
    p = plain.groupBy("o_orderstatus").count().collect()
    assert {(r.o_orderstatus, r["count"]) for r in s} == {(r.o_orderstatus, r["count"]) for r in p}


def test_bucketed_join_no_shuffle(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS tb_orders")
    spark.sql("DROP TABLE IF EXISTS tb_lineitem")
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "tb_orders", "o_orderkey", num_buckets=8
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "tb_lineitem", "o_orderkey", num_buckets=8,
    )
    joined = bucketed_join(spark, "tb_orders", "tb_lineitem", "o_orderkey")
    assert exchange_count(joined) == 0  # co-located: no shuffle exchange
    assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    spark.sql("DROP TABLE tb_orders")
    spark.sql("DROP TABLE tb_lineitem")


def test_write_compacted_sizes_output(spark, tmp_path):
    """Output file count follows the optimizer size estimate, not the
    upstream partition count (small-files defense)."""
    from chewdata_spark.operators.skew import write_compacted

    # 64 upstream partitions of a small dataset would write 64 files
    df = spark.range(10_000).repartition(64).selectExpr("id", "id * 2 AS v")
    out = tmp_path / "compact"
    n = write_compacted(df, str(out), target_file_mb=64)
    assert n == 1  # ~160 KB estimated → one file
    import glob

    parts = glob.glob(str(out / "part-*"))
    assert len(parts) == 1
    assert spark.read.parquet(str(out)).count() == 10_000


def test_profile_operator(spark):
    from chewdata_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None)], "id int, tag string"
    )
    rows = {r.column: r for r in profile(df, exact_distinct=True).collect()}
    assert rows["id"].n_nonnull == 3 and rows["id"].n_distinct == 3
    assert rows["tag"].n_nonnull == 2 and rows["tag"].n_distinct == 1
    assert abs(rows["tag"].null_rate - 0.3333) < 1e-9
    assert rows["tag"].min_str == "a" and rows["id"].max_str == "3"


def test_write_zorder_footers_prune_both_dims(spark, sf_dir, tmp_path):
    """End-to-end layout proof: write lineitem z-ordered on
    (date bucket, part bucket) and read the REAL parquet footers back —
    per-file min/max spans must be tight on BOTH dimensions, while a
    date-sorted write leaves the part dimension near-full-domain."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from chewdata_spark.operators.layout import write_zorder, zorder_key
    from chewdata_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    maxpk = li.agg(F.max("l_partkey")).first()[0]
    base = li.select(
        F.least(
            F.greatest(
                F.expr("datediff(l_shipdate, DATE '1992-01-01') div 10"), F.lit(0)
            ),
            F.lit(255),
        ).cast("int").alias("date_b"),
        F.expr(f"(l_partkey * 256) div ({maxpk} + 1)").cast("int").alias("part_b"),
    )
    zpath = str(tmp_path / "z")
    dpath = str(tmp_path / "d")
    write_zorder(
        base, zpath, zorder_key([F.col("date_b"), F.col("part_b")]), num_files=8
    )
    base.repartitionByRange(8, "date_b").sortWithinPartitions("date_b").write.mode(
        "overwrite"
    ).parquet(dpath)

    def avg_span(path, col):
        import glob

        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.read_metadata(f)
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                spans.append(max(his) - min(los) + 1)
        assert spans, f"no footer stats for {col} under {path}"
        return sum(spans) / len(spans)

    # 8 z-range files tile the 2-D space: each dim span ~256/sqrt(8)=90;
    # the date-sorted layout gets date ~256/8=32 but leaves part at full domain
    assert avg_span(zpath, "date_b") < 128
    assert avg_span(dpath, "date_b") < 64
    z_part = avg_span(zpath, "part_b")
    d_part = avg_span(dpath, "part_b")
    assert d_part > 200, f"date-sorted part span unexpectedly tight: {d_part}"
    assert z_part < 128 and z_part < d_part / 2, (z_part, d_part)


def test_writer_step_zorder_by_knob(spark, tmp_path):
    """The pipeline writer's zorder_by config must produce files whose
    footers are tight on both listed dimensions."""
    import glob

    import pyarrow.parquet as pq

    from chewdata_spark.pipeline import Pipeline

    src = str(tmp_path / "src.parquet")
    spark.range(20000).selectExpr(
        "id", "cast(id % 251 as int) as a", "cast((id * 37) % 241 as int) as b"
    ).write.parquet(src)
    dest = str(tmp_path / "zout")
    cfg = [
        {"type": "reader", "connector": {"type": "local", "path": src},
         "document": {"type": "parquet"}},
        {"type": "eraser", "connector": {"type": "local", "path": dest}},
        {"type": "writer", "connector": {"type": "local", "path": dest},
         "document": {"type": "parquet"},
         "zorder_by": ["a", "b"], "zorder_files": 16},
    ]
    Pipeline(cfg, spark).run()
    spans = {"a": [], "b": []}
    for f in glob.glob(dest + "/part-*.parquet"):
        md = pq.read_metadata(f)
        for col in spans:
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                spans[col].append(max(his) - min(los) + 1)
    assert len(spans["a"]) >= 8
    # 16 z-files over 2 dims: each dim span ~domain/4; allow 2x slack
    for col, domain in (("a", 251), ("b", 241)):
        avg = sum(spans[col]) / len(spans[col])
        assert avg < domain / 2, (col, avg)
