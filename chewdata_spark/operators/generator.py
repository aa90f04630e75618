"""Generator step: synthetic record seeds (reference src/step/generator.rs).

Two modes, like the reference:
- headless: emit N empty/seed records → ``spark.range(n)`` (distributed,
  no driver materialization; partition count scales with n);
- duplication: repeat each input record N times →
  ``explode(array_repeat(...))`` (no crossJoin shuffle).

Enrichment happens downstream via transformer actions / faker functions
(:mod:`chewdata_spark.functions.faker`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate(spark: SparkSession, n: int, *, num_partitions: int | None = None) -> DataFrame:
    """N seed records with an ``id`` column (0..n-1)."""
    if num_partitions:
        return spark.range(0, n, numPartitions=num_partitions)
    return spark.range(n)


def duplicate(df: DataFrame, n: int) -> DataFrame:
    """Each input record repeated n times (reference duplication mode).

    ``posexplode(array_repeat(...))`` stays map-side — no shuffle — and
    adds a ``copy_id`` so downstream faker enrichment can vary per copy.
    """
    rep = F.array_repeat(F.lit(1), n)
    return (
        df.select("*", F.posexplode(rep).alias("copy_id", "_one"))
        .drop("_one")
    )
