"""Object/structure helper parity tests (reference filters/object.rs,
helper/value.rs unit-test shapes)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from chewdata_spark.functions.objects import (
    extract,
    find,
    flatten,
    replace_key,
    replace_value,
    search,
)

NESTED = [
    {"id": 1, "rename_this": "x", "info": {"rename_this": "y", "keep": "k", "deep": {"v": 5}},
     "tags": [{"rename_this": "t1"}, {"rename_this": "t2"}]},
]


def _nested_df(spark):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in NESTED]))


def test_replace_key_recursive(spark):
    df = replace_key(_nested_df(spark), r"^rename_this$", "renamed")
    row = df.collect()[0]
    assert "renamed" in df.columns and "rename_this" not in df.columns
    assert row.info.asDict()["renamed"] == "y" and row.info.asDict()["keep"] == "k"
    assert [t.asDict() for t in row.tags] == [{"renamed": "t1"}, {"renamed": "t2"}]


def test_replace_value_recursive(spark):
    df = replace_value(_nested_df(spark), r"^[xy]$", "Z")
    row = df.collect()[0]
    assert row.rename_this == "Z" and row.info.rename_this == "Z"
    assert row.info.keep == "k" and row.id == 1  # non-matching / non-string untouched


def test_extract_preserves_structure(spark):
    df = extract(_nested_df(spark), ["id", "info.keep"])
    row = df.collect()[0]
    assert sorted(df.columns) == ["id", "info"]
    assert row.info.asDict() == {"keep": "k"}


def test_search_pointer(spark):
    df = _nested_df(spark)
    assert df.select(search(df, "/info/deep/v").alias("v")).collect()[0].v == 5
    assert df.select(search(df, "info.keep").alias("v")).collect()[0].v == "k"


def test_flatten_dotted_keys(spark):
    df = flatten(_nested_df(spark).select("id", "info"))
    assert sorted(df.columns) == ["id", "info.deep.v", "info.keep", "info.rename_this"]
    row = df.collect()[0]
    assert row["info.deep.v"] == 5


def test_find_regex_all(spark):
    df = spark.createDataFrame([("a1 b22 c333",)], "s: string")
    got = df.select(find("s", r"[a-z]\d+").alias("m")).collect()[0].m
    assert got == ["a1", "b22", "c333"]
