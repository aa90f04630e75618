"""Plan-property regression tests: the plans we want at 100 TB stay pinned.

A correctness-green query with a silently degraded plan (lost pushdown,
broadcast → SMJ flip, full-width scans) is a scale bug; these tests make
the plan shape part of the contract.
"""

from __future__ import annotations

from chewdata_spark.plans.inspection import (
    assert_filter_pushed,
    assert_no_sort_merge_join,
    assert_scan_prunes_to,
    exchange_count,
    join_counts,
    read_schemas,
)
from chewdata_spark.queries.dedup_queries import dedup_exact
from chewdata_spark.queries.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)
from chewdata_spark.queries.text_queries import text_stats


def test_q1_pushes_date_filter_and_prunes(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert_filter_pushed(df, "LessThanOrEqual(l_shipdate")
    # 7 of 11 lineitem columns: the scan must not read the other 4
    assert_scan_prunes_to(
        df,
        {
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        },
    )


def test_q3_broadcasts_dim_and_pushes_segment_filter(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert_filter_pushed(df, "EqualTo(c_mktsegment,BUILDING)")
    assert join_counts(df)["broadcast_hash"] >= 2
    assert_no_sort_merge_join(df)
    # lineitem scan: join key + the two revenue columns only
    assert_scan_prunes_to(df, {"l_orderkey", "l_extendedprice", "l_discount"})


def test_q5_star_join_is_all_broadcast(spark, sf_dir):
    df = q5_local_supplier_volume(spark, sf_dir)
    jc = join_counts(df)
    assert jc["broadcast_hash"] >= 5 and jc["sort_merge"] == 0


def test_text_stats_reads_only_needed_columns(spark, sf_dir):
    df = text_stats(spark, sf_dir)
    assert read_schemas(df) == [["doc_id", "text"]]


def test_dedup_exact_single_shuffle(spark, sf_dir):
    df = dedup_exact(spark, sf_dir)
    assert exchange_count(df) <= 1
