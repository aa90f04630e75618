"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (fact-fact join + broadcast dim +
  top-N) on /root/testdata/sf0.001.
- ``queries()`` — every implemented operator from SURVEY.md §2 plus the
  training-data operators, as (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query.  Queries built on
  seeded-xxhash64 algorithms (MinHash/SimHash LSH, SRP) are
  deliberately absent here → rows-only checks; each has a portable
  md5-hash twin (``*_md5``) whose oracle replays the full pipeline —
  signatures, buckets, verification, clustering — bit-for-bit, and
  recall against the exact variants is asserted in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chewdata_spark.queries import all_oracles, all_queries
from chewdata_spark.queries.relational import q3_shipping_priority


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
