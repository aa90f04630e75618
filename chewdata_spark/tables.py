"""Test-data table loading helpers.

The driver provides TPC-H-ish parquet tables plus ``events`` /
``documents`` / ``embeddings`` at ``/root/testdata/sf*/``.  All loads
are plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and partition-sized splits for free.

``DIM_TABLES`` are the small dimension tables an engine should
broadcast in joins at any scale factor — at 100 TB, region/nation stay
tiny and customer/supplier/part grow sub-linearly vs. the fact tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Always safe to broadcast regardless of scale factor.
DIM_TABLES = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Timestamp columns have shipped as parquet timestamp[ns] (which
    # Spark refuses by default), timestamp[us] without tz annotation
    # (which Spark 4 infers as TIMESTAMP_NTZ), and plain TIMESTAMP
    # across testdata generations.  Normalize every variant to
    # TIMESTAMP so downstream epoch math (unix_micros/unix_timestamp)
    # resolves; with the session pinned to UTC the NTZ→LTZ cast is a
    # numeric identity, matching DuckDB's naive-timestamp view.
    # ns-typed columns can appear in ANY table between testdata
    # generations, not just events.ts — detect them from the parquet
    # footer (one cheap metadata read) so the nanosAsLong conf and the
    # bigint→timestamp repair always target the right columns.
    ns_cols: set[str] = set()
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        ns_cols = {
            f.name
            for f in pq.read_schema(path)
            # unit check, not string match: tz-annotated nanos
            # ("timestamp[ns, tz=UTC]") must repair too
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception:
        pass  # directory datasets etc. — fall back to the name rule
    if ns_cols or name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dtype == "bigint" and (col in ns_cols or (name == "events" and col == "ts")):
            # nanos read as long: truncate to micros in integer math —
            # double division would lose precision above 2^53 ns.
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
