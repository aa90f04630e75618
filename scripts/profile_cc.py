"""A/B for the connected-components convergence check — guide §1.
OLD: two exceptAll probes per round.  NEW: count-equality
short-circuit (counts differ -> round is provably not converged, skip
both exceptAll jobs) + ONE one-directional exceptAll when counts match
(edge sets are distinct-deduped, so |new| == |old| and new \\ old = 0
imply set equality).  Interleaved in one JVM."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import dedup as D
from chewdata_spark.operators import graph as G


def cc_new(pairs, src="id_a", dst="id_b", max_iter=25):
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    converged = False
    for _ in range(max_iter):
        new_edges = G._star_round(G._star_round(edges, large=True), large=False)
        new_edges = new_edges.localCheckpoint(eager=True)
        n_new = new_edges.count()
        if n_new == n_edges and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            converged = True
            break
        edges, n_edges = new_edges, n_new
    if not converged:
        raise RuntimeError("no convergence")
    labels = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
        .union(edges.select(F.col("v").alias("node"), F.col("v").alias("lbl")))
        .groupBy("node")
        .agg(F.min("lbl").alias("cluster_id"))
    )
    return labels


def t(fn, label, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best:7.2f}s", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cc-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "doc_id", "text", num_perm=64, shingle_size=3)
    pairs = D.minhash_candidate_pairs(
        sigs, num_perm=64, bands=16, jaccard_threshold=0.5
    ).localCheckpoint(eager=True)
    print("pairs:", pairs.count(), flush=True)

    def old():
        return G.connected_components(pairs)

    def new():
        return cc_new(pairs)

    old().write.format("noop").mode("overwrite").save()  # warm
    for rnd in range(2):
        t(old, f"A/B r{rnd}: CC convergence OLD")
        t(new, f"A/B r{rnd}: CC convergence NEW")

    a = old().withColumnRenamed("cluster_id", "ca")
    b = new().withColumnRenamed("cluster_id", "cb")
    bad = a.join(b, "node", "full").filter(
        F.col("ca").isNull() | F.col("cb").isNull() | (F.col("ca") != F.col("cb"))
    )
    print("label mismatches:", bad.count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
