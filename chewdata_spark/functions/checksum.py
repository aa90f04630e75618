"""Checksum helpers (reference src/helper/checksum.rs:26-96).

The reference verifies file digests (sha2/sha3 224-512) on local
connector reads.  Spark-side: column digests are native (`F.sha2`,
`F.md5`); whole-file digests run over `binaryFile` rows so a directory
of files verifies in parallel.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ALGORITHMS = ("sha224", "sha256", "sha384", "sha512", "sha3_224", "sha3_256", "sha3_384", "sha3_512", "md5")


def column_digest(col: Column | str, algo: str = "sha256") -> Column:
    """Digest of a column's UTF-8 bytes, JVM-side where possible."""
    c = F.col(col) if isinstance(col, str) else col
    if algo in ("sha224", "sha256", "sha384", "sha512"):
        return F.sha2(c.cast("binary"), int(algo[3:]))
    if algo == "md5":
        return F.md5(c.cast("binary"))
    raise ValueError(f"unsupported column algo {algo!r} (sha3 needs file_digests)")


def file_digests(spark: SparkSession, path: str, algo: str = "sha256") -> DataFrame:
    """(path, digest) per file under `path` — parallel over executors."""
    if algo not in ALGORITHMS:
        raise ValueError(f"unsupported algo {algo!r}; expected one of {ALGORITHMS}")
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            digests = [getattr(hashlib, algo)(bytes(b)).hexdigest() for b in pdf["content"]]
            yield pd.DataFrame({"path": pdf["path"], "digest": digests})

    return files.mapInPandas(gen, "path string, digest string")


def verify_file(spark: SparkSession, path: str, expected: str, algo: str = "sha256") -> bool:
    """True iff every file under `path` matches `expected` (single-file
    verify parity with the reference's read-path check)."""
    rows = file_digests(spark, path, algo).collect()
    return bool(rows) and all(r.digest == expected for r in rows)
