"""Time the prefix-doubling loop (construction-time eager checkpoints)
and the remaining flagship stages on a known-quiet host, including
per-round active-set sizes — the doubling loop runs at construction,
so noop timing mis-attributes it (profile_sa.py stage 6)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import dedup as D
from chewdata_spark.operators.text import normalize_text
from chewdata_spark.operators import suffix as S


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("loop-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(docs, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    )
    lined = (
        D.dedup_lines_global(norm, "doc_id", "text", min_words=5)
        .select("doc_id", F.col("clean_text").alias("text"))
        .localCheckpoint()
    )
    tile, min_len = 128, 30
    stride = tile - (min_len - 1)
    wdocs = S._tiled_docs(lined, "doc_id", "text", tile, stride).localCheckpoint()

    pos = (
        wdocs.select(
            "doc_id",
            F.explode(F.expr("sequence(1, length(t))")).alias("off"),
            "t",
        ).select("doc_id", "off", F.expr("substring(t, off, 8)").alias("g8"))
    )
    base = S._two_level_base_ranks(
        pos, "g8", bucket=F.substring("g8", 1, 4),
        bucket2=F.substring(F.col("_bk"), 1, 2),
    )

    # warm the base computation once so loop timing isn't paying
    # parquet/codegen warmup
    t0 = time.perf_counter()
    base.write.format("noop").mode("overwrite").save()
    print(f"base ranks (cold) {time.perf_counter()-t0:6.2f}s", flush=True)
    t0 = time.perf_counter()
    base.write.format("noop").mode("overwrite").save()
    print(f"base ranks (warm) {time.perf_counter()-t0:6.2f}s", flush=True)

    # instrumented _prefix_double replica with per-round timing
    max_units, h0 = tile, 8
    t_all = time.perf_counter()
    work = base.localCheckpoint()
    print(f"round0 checkpoint  {time.perf_counter()-t_all:6.2f}s  rows={work.count()}", flush=True)
    frozen = []
    h = h0
    grp_w = Window.partitionBy("rank").orderBy("nxt")
    while h < max_units:
        t0 = time.perf_counter()
        sized = work.withColumn(
            "_m", F.count(F.lit(1)).over(Window.partitionBy("rank"))
        ).localCheckpoint()
        t1 = time.perf_counter()
        still = sized.filter(F.col("_m") >= 2).drop("_m")
        done = sized.filter(F.col("_m") == 1).drop("_m")
        frozen.append(done)
        empty = still.isEmpty()
        t2 = time.perf_counter()
        n_still = still.count()
        if empty:
            work = None
            print(f"h={h}: converged; sized={t1-t0:.2f}s isEmpty={t2-t1:.2f}s", flush=True)
            break
        full = still
        for piece in frozen:
            full = full.unionByName(piece)
        lookup = full.select(
            "doc_id", (F.col("off") - h).alias("off"), F.col("rank").alias("nxt")
        ).filter(F.col("off") >= 1)
        t3 = time.perf_counter()
        work = (
            still.join(lookup, ["doc_id", "off"], "left")
            .withColumn("nxt", F.coalesce("nxt", F.lit(0)))
            .select(
                "doc_id", "off",
                (F.col("rank") + F.rank().over(grp_w) - 1).alias("rank"),
            )
            .localCheckpoint()
        )
        t4 = time.perf_counter()
        print(
            f"h={h}: sized={t1-t0:.2f}s isEmpty+count={t3-t2:.2f}s "
            f"join+window+ckpt={t4-t3:.2f}s active={n_still}",
            flush=True,
        )
        h *= 2
    print(f"TOTAL loop {time.perf_counter()-t_all:6.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
