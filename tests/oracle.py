"""Local replica of the driver's DuckDB-oracle comparison.

Strict by design: columns sorted by name, rows sorted, exact value
equality (timestamps/floats canonicalized to strings the same way on
both sides) — if this passes, a value-hash comparison passes too.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from chewdata_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        # tz-annotated parquet makes DuckDB return aware datetimes while
        # Spark collects naive (session UTC) — same instant, one form
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str(v)
    if isinstance(v, datetime.date):
        return str(v)
    return f"{type(v).__name__}:{v!r}"


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


# Spark simpleString -> DuckDB type strings the driver's type-sensitive
# hasher treats as equivalent.  Anything outside this map (HUGEINT from
# SUM-over-integers, unchecked DECIMAL arithmetic, ...) is a drift the
# driver flags even when values are identical — see q12 in round 4.
_SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    # TIMESTAMP_NS appears when testdata ships ns-typed parquet; both
    # engines surface us-precision Python datetimes, so it hashes alike
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"},
    "timestamp_ntz": {"TIMESTAMP"},
    "boolean": {"BOOLEAN"},
}


def duck_type_ok(spark_simple: str, duck_type: str) -> bool:
    """True when the DuckDB output type is hash-equivalent to Spark's."""
    if spark_simple.startswith("array<") and spark_simple.endswith(">"):
        return duck_type.endswith("[]") and duck_type_ok(
            spark_simple[6:-1], duck_type[:-2]
        )
    if spark_simple.startswith("decimal("):
        return duck_type.replace(" ", "") == spark_simple.upper().replace(" ", "")
    return duck_type in _SPARK_TO_DUCK.get(spark_simple, set())


def type_mismatches(spark_df, rel) -> list[str]:
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    out = []
    for col, dt in zip(rel.columns, rel.types):
        st = spark_types.get(col)
        if st is not None and not duck_type_ok(st, str(dt)):
            out.append(f"{col}: spark={st} duckdb={dt}")
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    bad_types = type_mismatches(spark_df, rel)
    if bad_types:
        return False, f"output types differ (driver hasher is type-sensitive): {bad_types}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs = canonical_rows(s_cols, s_rows)
    cd = canonical_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"OK ({len(s_rows)} rows)"
