"""The error-channel dataflow (reference DataResult::Ok|Err, src/lib.rs:226-302).

A record is Err iff ``_error`` is non-null.  Steps declare
``data_type: ok|err``: they act on their stream and pass the other one
through unchanged — here that is a filter + union, which Catalyst
pushes down / prunes like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chewdata_spark.operators.validator import ERROR_COL


def with_error_col(df: DataFrame) -> DataFrame:
    """Ensure the ``_error`` channel column exists (all-Ok by default)."""
    if ERROR_COL not in df.columns:
        df = df.withColumn(ERROR_COL, F.lit(None).cast("string"))
    return df


def ok_stream(df: DataFrame) -> DataFrame:
    if ERROR_COL not in df.columns:
        return df
    return df.filter(F.col(ERROR_COL).isNull())


def err_stream(df: DataFrame) -> DataFrame:
    if ERROR_COL not in df.columns:
        return df.limit(0)
    return df.filter(F.col(ERROR_COL).isNotNull())


def split_streams(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    df = with_error_col(df)
    return ok_stream(df), err_stream(df)
