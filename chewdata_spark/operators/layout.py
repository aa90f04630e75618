"""Data-layout operators: multi-dimensional clustering keys.

At 100 TB the cheapest query is the one that never reads the file:
parquet readers prune whole files on column min/max footers, but a
layout sorted on ONE column leaves every OTHER column's min/max spans
near-full-domain per file.  A Z-order (Morton) key interleaves the
bits of several bucketed columns so files are compact in EVERY
interleaved dimension at once — the device behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` (public docs) — and writing with
``df.repartitionByRange(N, zkey).sortWithinPartitions(zkey)`` gives
each output file a tight z-range.

The key is plain integer arithmetic (shift/and), so the same math is
replayable in any engine (the DuckDB oracles use ``//``/``%`` forms).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` already-bucketed integer
    columns (each in ``[0, 2**bits)``) into one ``bits*len(cols)``-bit
    sort key.  ``cols[0]`` takes the highest bit position within each
    interleave group, so it is the (slightly) dominant dimension.

    Bucketing is the caller's job (clamp/scale to the bit width): the
    key is only as good as the bucket monotonicity.  For 2 cols at 8
    bits the key fits in 16 bits — an INT column that sorts, range-
    partitions, and min/max-prunes like any other."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    terms = []
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            pos = n * i + (n - 1 - j)
            terms.append(F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)), pos))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """The DuckDB-portable arithmetic twin of :func:`zorder_key` —
    ``((e // 2^i) % 2) * 2^pos`` summed — so layout decisions made by
    the Spark side are bit-replayable in the oracle."""
    n = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            pos = n * i + (n - 1 - j)
            terms.append(f"((({e}) // {2 ** i}) % 2) * {2 ** pos}")
    return "(" + " + ".join(terms) + ")"


def write_zorder(
    df,
    path: str,
    zkey,
    *,
    num_files: int = 64,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by a Z-order key: range-partition on the
    key (each output file owns a contiguous z-range) and sort within
    partitions, so every file's parquet footer carries tight min/max
    spans on EVERY dimension interleaved into the key — the write half
    of ``OPTIMIZE ZORDER BY``.  The range partitioner samples the key
    distribution, so file sizes stay balanced even when the z-space is
    occupied unevenly.  Verified end-to-end in
    tests/test_skew_bucketing.py: footers of a z-ordered write prune
    ~8x tighter on the secondary dimension than a date-sorted write."""
    (
        df.repartitionByRange(num_files, zkey)
        .sortWithinPartitions(zkey)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def zorder_frame(df, cols: list[str], *, num_files: int = 64, bits: int = 8):
    """Re-lay ``df`` for multi-dimensional min/max pruning: scale each
    named column to a ``bits``-bit bucket against its observed min/max
    (one eager stats pass — the same scan ANALYZE would do), interleave
    into a Morton key, range-partition + sort.  Dates/timestamps bucket
    on their epoch value; strings are not supported (bucket them to a
    numeric surrogate first).  Used by the writer step's ``zorder_by``
    config knob."""
    from pyspark.sql import functions as F

    dts = dict(df.dtypes)
    nums = []
    for c in cols:
        dt = dts[c]
        if dt == "date":
            nums.append(F.datediff(F.col(c), F.to_date(F.lit("1970-01-01"))).cast("double"))
        elif dt.startswith("timestamp"):
            nums.append(F.col(c).cast("long").cast("double"))
        elif dt == "string":
            raise ValueError(f"zorder_by does not support string column {c!r}")
        else:
            nums.append(F.col(c).cast("double"))
    stats = df.agg(
        *[F.min(n).alias(f"lo{i}") for i, n in enumerate(nums)],
        *[F.max(n).alias(f"hi{i}") for i, n in enumerate(nums)],
    ).first()
    top = (1 << bits) - 1
    bucketed = []
    for i, n in enumerate(nums):
        lo, hi = stats[f"lo{i}"], stats[f"hi{i}"]
        if lo is None or hi is None or hi <= lo:
            bucketed.append(F.lit(0))
            continue
        scaled = ((n - F.lit(float(lo))) / F.lit(float(hi - lo)) * top)
        bucketed.append(
            F.least(F.greatest(F.floor(scaled).cast("int"), F.lit(0)), F.lit(top))
        )
    key = zorder_key(bucketed, bits=bits)
    return df.repartitionByRange(num_files, key.alias("_zkey")).sortWithinPartitions(
        key.alias("_zkey")
    )
