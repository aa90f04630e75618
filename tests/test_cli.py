"""CLI connector: stdin ingest / stdout emit (pipe-chaining parity)."""

from __future__ import annotations

import io
import json
import sys

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


def test_main_passthrough_subprocess():
    """`echo data | python -m chewdata_spark` echoes records as JSONL
    (the reference's default passthrough pipeline)."""
    import json
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "chewdata_spark"],
        input='[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]',
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = sorted((json.loads(l) for l in proc.stdout.strip().splitlines() if l.startswith("{")), key=lambda d: d["a"])
    assert rows == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]


def test_main_transform_config_subprocess():
    import json
    import subprocess

    cfg = ('[{"type":"r"},'
           '{"type":"t","actions":[{"field":"c","pattern":"{{ input.a * 3 }}"}]},'
           '{"type":"w"}]')
    proc = subprocess.run(
        [sys.executable, "-m", "chewdata_spark", cfg],
        input='[{"a": 2}]',
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert rows == [{"a": 2, "c": 6}]


def test_from_config_yaml(spark):
    from chewdata_spark.pipeline import Pipeline

    cfg = """
- type: reader
  connector:
    type: in_memory
    data: '[{"a": 5}]'
- type: transform
  actions:
    - field: b
      pattern: "{{ input.a + 1 }}"
"""
    df = Pipeline.from_config(cfg, spark).dataframe()
    assert [r.b for r in df.collect()] == [6]
