"""CLI connector: stdin ingest / stdout emit (pipe-chaining parity)."""

from __future__ import annotations

import io
import json

from chewdata_spark.sources.cli import read_stdin, write_stdout


def test_read_stdin_ndjson(spark):
    df = read_stdin(spark, io.StringIO('{"a": 1}\n{"a": 2}\n'))
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_read_stdin_array(spark):
    df = read_stdin(spark, io.StringIO('[{"a": 1}, {"a": 2}, {"a": 3}]'))
    assert df.count() == 3


def test_round_trip_pipe(spark):
    df = read_stdin(spark, io.StringIO('[{"x": 10, "y": "b"}]'))
    out = io.StringIO()
    n = write_stdout(df, out)
    assert n == 1
    assert json.loads(out.getvalue()) == {"x": 10, "y": "b"}
