"""CLI (stdin/stdout) connector — pipe-chaining parity.

The reference's `cli` connector (src/connector/cli.rs:44-203) reads
records from stdin and writes to stdout so pipelines compose with unix
pipes.  This is a driver-side convenience, not a cluster operator: the
driver ingests stdin once (parallelized immediately) and prints results
as JSON lines.
"""

from __future__ import annotations

import json
import sys
from typing import IO

from pyspark.sql import DataFrame, SparkSession


def read_stdin(spark: SparkSession, stream: IO[str] | None = None) -> DataFrame:
    """Parse JSON (NDJSON or a single array/object) from stdin into a
    DataFrame; distribution happens right after ingest."""
    raw = (stream or sys.stdin).read().strip()
    if not raw:
        return spark.range(0).drop("id")
    records: list
    try:
        first = json.loads(raw)
        records = first if isinstance(first, list) else [first]
    except json.JSONDecodeError:
        records = [json.loads(line) for line in raw.splitlines() if line.strip()]
    lines = [json.dumps(r, ensure_ascii=False) for r in records]
    return spark.read.json(spark.sparkContext.parallelize(lines, max(1, len(lines) // 1000 or 1)))


def write_stdout(df: DataFrame, stream: IO[str] | None = None, *, limit: int | None = None) -> int:
    """Write the DataFrame as JSON lines to stdout; returns row count.
    `limit` caps driver materialization (unbounded collect is a scale
    hazard — always bound it for interactive use)."""
    out = stream or sys.stdout
    it = df.limit(limit).toJSON().collect() if limit else df.toJSON().collect()
    for line in it:
        out.write(line + "\n")
    return len(it)
