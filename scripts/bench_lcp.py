"""Microbench: LCP-cursor variants (guide §1 measure-first for the
round-15 LCP optimization).

The current ``_lcp_sql`` folds over ``sequence(1, least(len, len))`` —
up to 128 interpreted lambda steps per pair (Catalyst higher-order
functions are CodegenFallback).  The candidate replaces it with greedy
binary refinement over descending power-of-two widths: 8 steps, each
one substring/slice equality.  Both are exact; this measures them on a
pair relation shaped like the flagship workload (~1M pairs, 128-char
suffixes, mixed LCP profile) and cross-checks equality row-by-row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.operators.suffix import _lcp_sql


def lcp_binary_sql(unit: str, a: str = "suf", b: str = "suf2", cap: int = 128) -> str:
    powers = []
    w = 1
    while w < cap:
        w *= 2
    while w >= 1:
        powers.append(w)
        w //= 2
    arr = ",".join(str(p) for p in powers)
    if unit == "char":
        size, win = "length", "substring({col}, n + 1, {w})"
    else:
        size, win = "size", "slice({col}, n + 1, {w})"
    wa = win.format(col=a, w="w")
    wb = win.format(col=b, w="w")
    return f"""
        least(
          least({size}({a}), {size}({b})),
          aggregate(
            array({arr}),
            0,
            (n, w) -> if({wa} = {wb}, n + w, n)
          )
        )
    """


def main():
    spark = get_spark("lcp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # pair relation: 1M pairs; suffix lengths 1..128; LCP profile mixed
    # (many zero/small, tail of large) like adjacent-suffix pairs
    pairs = spark.range(1_000_000).selectExpr(
        "id",
        # base string: repeated deterministic junk, 128 chars
        "substring(repeat(concat('lorem ipsum dolor sit amet ', cast(id % 7 as string), ' '), 8), 1, 128) as base",
        "cast(id % 128 as int) as l",
    ).selectExpr(
        "substring(base, 1, 1 + cast(id % 127 as int)) as suf",
        # suf2 shares exactly l chars then diverges
        "concat(substring(base, 1, l), 'X', substring(base, l + 2)) as suf2",
    ).localCheckpoint()

    cur = pairs.select(F.expr(_lcp_sql("char")).alias("m"))
    new = pairs.select(F.expr(lcp_binary_sql("char")).alias("m"))

    # correctness first: row-by-row equality
    diff = (
        pairs.select(
            F.expr(_lcp_sql("char")).alias("m1"),
            F.expr(lcp_binary_sql("char")).alias("m2"),
        )
        .filter("m1 <> m2")
        .count()
    )
    print("mismatch rows:", diff, flush=True)

    for label, df in (("current fold", cur), ("binary refine", new)):
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:15s} {best:7.2f}s", flush=True)

    # token grain: arrays of short tokens
    toks = spark.range(300_000).selectExpr(
        "slice(split(repeat(concat('tok', cast(id % 11 as string), ' '), 40), ' '), 1, 1 + cast(id % 39 as int)) as suf",
        "concat(slice(split(repeat(concat('tok', cast(id % 11 as string), ' '), 40), ' '), 1, cast(id % 13 as int)), array('ZZZ'), array('a','b','c')) as suf2",
    ).localCheckpoint()
    diff = (
        toks.select(
            F.expr(_lcp_sql("token")).alias("m1"),
            F.expr(lcp_binary_sql("token", cap=64)).alias("m2"),
        )
        .filter("m1 <> m2")
        .count()
    )
    print("token mismatch rows:", diff, flush=True)
    for label, sql in (("tok fold", _lcp_sql("token")), ("tok binary", lcp_binary_sql("token", cap=64))):
        df = toks.select(F.expr(sql).alias("m"))
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:15s} {best:7.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
