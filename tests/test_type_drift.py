"""Type-drift armor: the driver regenerates testdata between rounds and
temporal columns have shipped as DATE-like, timestamp[us] (no tz →
Spark TIMESTAMP_NTZ) and timestamp[ns] (Spark refuses without
nanosAsLong) across generations.  Round 3's bench crashed on exactly
this class.  These tests rewrite sf0.001 into each observed variant and
run the date-heavy oracle queries against every copy, so the next
drift breaks HERE instead of in the driver run.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from chewdata_spark.tables import TABLE_NAMES

from tests.oracle import compare, duckdb_connection

SRC = "/root/testdata/sf0.001"

# table -> temporal columns to rewrite
TEMPORAL = {
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
    "events": ["ts"],
}

# date32 only applies to day-granular columns; events.ts keeps its
# time-of-day in every variant
VARIANTS = {
    "date32": {
        "lineitem": pa.date32(),
        "orders": pa.date32(),
        "events": pa.timestamp("us"),
    },
    "us_ntz": {
        "lineitem": pa.timestamp("us"),
        "orders": pa.timestamp("us"),
        "events": pa.timestamp("us"),
    },
    "ns": {
        "lineitem": pa.timestamp("ns"),
        "orders": pa.timestamp("ns"),
        "events": pa.timestamp("ns"),
    },
    # tz-annotated nanos: detection must key on the arrow unit, not the
    # exact "timestamp[ns]" string (code-review finding, round 5)
    "ns_utc": {
        "lineitem": pa.timestamp("ns", tz="UTC"),
        "orders": pa.timestamp("ns", tz="UTC"),
        "events": pa.timestamp("ns", tz="UTC"),
    },
}

# date-heavy oracle-backed queries: filters, datediff buckets, as-of
# join, sessionization, and a raw-timestamp-output projection
QUERY_NAMES = [
    "q1_pricing_summary",
    "q4_late_order_priority",   # interval arithmetic in a join condition
    "q6_forecast_revenue",      # timestamp-literal range filters
    "q12_ship_delay_priority",  # datediff bucketing over both tables
    "events_asof_orders",
    "events_gap_fill",          # grid resample over ts
    "running_daily_revenue",    # date_trunc windowing
    "sessionize_events",
    "user_event_gaps",
    "events_ohlc_hourly",       # date_trunc bucket + first/last rank
    "events_rolling_24h",       # unix_micros RANGE frame
    "events_sliding_rate",      # F.window() sliding buckets
    "event_transition_matrix",  # lag over ts ordering
    "user_retention_cohorts",   # date_trunc('week') + datediff
    "user_state_history",       # SCD2 valid_from/valid_to intervals
    "monthly_revenue_trend",    # month truncation + moving window
    "supplier_reliability",     # ship-vs-order datediff gate
    "customer_rfm_segments",    # recency datediff vs max orderdate
]


def _rewrite(src: str, dst: str, cast_to: pa.DataType, cols: list[str]) -> None:
    t = pq.read_table(src)
    for col in cols:
        i = t.schema.get_field_index(col)
        arr = t.column(col).cast(cast_to, safe=False)
        t = t.set_column(i, col, arr)
    pq.write_table(t, dst)


@pytest.fixture(scope="module", params=sorted(VARIANTS))
def drift_dir(request, tmp_path_factory):
    variant = request.param
    d = tmp_path_factory.mktemp(f"sf0.001_{variant}")
    for name in TABLE_NAMES:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = str(d / f"{name}.parquet")
        if name in TEMPORAL:
            _rewrite(src, dst, VARIANTS[variant][name], TEMPORAL[name])
        else:
            shutil.copyfile(src, dst)
    return str(d)


@pytest.fixture(scope="module")
def drift_con(drift_dir):
    con = duckdb_connection(drift_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_survives_temporal_type_drift(name, spark, drift_dir, drift_con):
    from chewdata_spark.queries import all_oracles, all_queries

    df = all_queries()[name](spark, drift_dir)
    ok, msg = compare(df, drift_con, all_oracles()[name])
    assert ok, f"{name} under drifted temporal types: {msg}"


def test_streaming_reader_survives_drift(spark, drift_dir):
    # streaming readers bypass load_table and must repeat its
    # normalization themselves (stream_events_hourly crashed round 3)
    from chewdata_spark.queries import all_queries

    df = all_queries()["stream_events_hourly"](spark, drift_dir)
    assert df.count() > 0
