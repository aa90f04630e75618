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


def test_reference_serde_aliases(spark, tmp_path):
    """The reference accepts short serde aliases everywhere
    (reader.rs:60-68, connector/mod.rs:47-48, document/mod.rs:46):
    conn→connector, mem→in_memory, doc→document, yml→yaml, refs,
    alias→name — a config written with them must compile identically."""
    from chewdata_spark.pipeline import Pipeline

    target = tmp_path / "out.yml"
    cfg = [
        {"type": "r", "conn": {"type": "mem", "data": '[{"a": 1}, {"a": 2}]'}, "alias": "src"},
        {"type": "t", "actions": [{"field": "b", "pattern": "{{ input.a * 10 }}"}]},
        {"type": "w", "conn": {"type": "local", "path": str(target)}, "doc": {"type": "yml"}},
    ]
    df, writes = Pipeline(cfg, spark).run()
    assert sorted(r.b for r in df.collect()) == [10, 20]
    assert writes[0].fmt == "yaml"
    import yaml as _yaml

    docs = [
        d
        for f in sorted(target.glob("part-*"))
        for d in _yaml.safe_load_all(f.read_text())
        if d
    ]
    assert sorted(d["b"] for d in docs) == [10, 20]


def test_metadata_mime_subtype_path_holes(spark, tmp_path):
    """The reference's dynamic-file idiom (examples/local-dynamic_file.rs):
    `{{ metadata.mime_subtype }}` in a path resolves from the step's
    document metadata — write `out.json` for a json document, then read
    it back through the same templated path."""
    from chewdata_spark.pipeline import Pipeline

    out = tmp_path / "dyn"
    write_cfg = [
        {"type": "r", "conn": {"type": "mem", "data": '[{"a": 1}, {"a": 2}]'}},
        {
            "type": "w",
            "conn": {"type": "local", "path": f"{out}.{{{{ metadata.mime_subtype }}}}"},
            "doc": {"type": "json"},
        },
    ]
    _, writes = Pipeline(write_cfg, spark).run()
    assert writes[0].path.endswith(".json")
    read_cfg = [
        {
            "type": "r",
            "conn": {"type": "local", "path": f"{out}.{{{{ metadata.mime_subtype }}}}"},
            "doc": {"type": "json"},
        },
    ]
    df = Pipeline(read_cfg, spark).dataframe()
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_main_config_file_flag(tmp_path):
    """`python -m chewdata_spark -f config.yaml` reads the step list
    from a file (reference src/main.rs:73-111)."""
    import json
    import subprocess

    cfg = tmp_path / "steps.yaml"
    cfg.write_text(
        "- type: r\n"
        "- type: t\n"
        "  actions:\n"
        "    - field: doubled\n"
        "      pattern: '{{ input.a * 2 }}'\n"
        "- type: w\n"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "chewdata_spark", "-f", str(cfg)],
        input='[{"a": 3}]',
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and rows[0]["doubled"] == 6


def test_main_file_flag_missing_arg_errors():
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "chewdata_spark", "--file"],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert proc.returncode == 2 and "usage" in proc.stderr


def test_main_version_flag():
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "chewdata_spark", "--version"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert proc.returncode == 0 and proc.stdout.strip()
