"""Row-set equality check for the r15 _neighbour_scores restructure:
OLD (per-position semi-join prefilter, unchecked seen side) vs NEW
(bucket-grain prefilter folded into the salting join, lazy-checkpointed
seen/salt relations) must emit the identical (doc_id, off, m) relation
for every scorer consumer shape.  exceptAll both ways == 0 rows."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S
from scripts.ab_scorer import old_neighbour_scores

NEW_NS = S._neighbour_scores


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scorer-eq")
    spark.sparkContext.setLogLevel("ERROR")
    from chewdata_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    shapes = [
        # (new_filter, seen_filter, full_doc, max_bucket)
        (F.col("doc_id") % 2 == 1, F.col("doc_id") % 2 == 0, True, 10_000),
        (F.col("doc_id") % 97 != 0, F.col("doc_id") % 97 == 0, False, 10_000),
        # tiny max_bucket exercises the cap + salting branches hard
        (F.col("doc_id") % 3 != 0, F.col("doc_id") % 3 == 0, True, 50),
        # cap disabled
        (F.col("doc_id") % 5 != 0, F.col("doc_id") % 5 == 0, False, None),
    ]
    bad = 0
    for i, (nf, sf_, full, mb) in enumerate(shapes):
        new_side = docs.filter(nf)
        seen_side = docs.filter(sf_)

        def run():
            return S.sa_contamination_scores(
                new_side, seen_side, "doc_id", "text",
                max_chars=64, min_len=30, bucket_len=8,
                max_bucket=mb, full_doc=full,
            )

        S._neighbour_scores = old_neighbour_scores
        old = run()
        S._neighbour_scores = NEW_NS
        new = run()
        a = old.exceptAll(new).count()
        b = new.exceptAll(old).count()
        n = new.count()
        status = "OK" if a == 0 and b == 0 else "MISMATCH"
        if status != "OK":
            bad += 1
        print(
            f"shape {i}: old\\new={a} new\\old={b} rows={n} {status}",
            flush=True,
        )
    S._neighbour_scores = NEW_NS
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
