"""r16 verdict item 6: one scale-evidence bench point for the SA
family beyond sf0.1.

The sandbox only ships sf{0.001,0.01,0.1} (read-only), so this script
synthesizes a LARGER documents relation deterministically from sf0.1:
replica 0 is the original corpus verbatim; replica k >= 1 keeps every
doc's id-space (doc_id + k * 1_000_000), length, lang/source mix and
unigram distribution but reshuffles the word order with a seeded RNG
— chance n-gram repeats (the corpus's repeat structure: a 31-word
vocabulary) reproduce at the same statistical rate, so the SA
queries' work profile scales like a real corpus 3x the size.  All
other tables copy from sf0.1 unchanged.  This is a PERF measurement
harness only — never an oracle surface, never read by bench.py, and
the generated dir lives under /tmp (not keyed into any query).

Usage:
  python scripts/scale_sa_bench.py gen 3          # build /tmp/sa_scale/sf0.3
  SPARK_GRAFT_CPUS=32 python scripts/scale_sa_bench.py run /tmp/sa_scale/sf0.3
  SPARK_GRAFT_CPUS=8  python scripts/scale_sa_bench.py run /tmp/sa_scale/sf0.3
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SA_HEADLINE = [
    "curate_pipeline_decontam_sa_bpe",
    "curate_pipeline_decontam_sa",
    "curate_pipeline_full_sa",
    "dedup_cut_spans_sa_full",
    "stream_cut_spans_sa_full",
]


def gen(mult: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"/tmp/sa_scale/sf0.{mult}"
    os.makedirs(out, exist_ok=True)
    for name in os.listdir(SRC):
        if name != "documents.parquet":
            shutil.copy(os.path.join(SRC, name), os.path.join(out, name))
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    n = len(cols["doc_id"])
    out_cols = {c: list(v) for c, v in cols.items()}
    for k in range(1, mult):
        rng = random.Random(1000 + k)
        for i in range(n):
            words = cols["text"][i].split(" ")
            rng.shuffle(words)
            out_cols["doc_id"].append(cols["doc_id"][i] + k * 1_000_000)
            out_cols["text"].append(" ".join(words))
            out_cols["lang"].append(cols["lang"][i])
            out_cols["source"].append(cols["source"][i])
            out_cols["n_chars"].append(cols["n_chars"][i])
    pq.write_table(
        pa.table({c: out_cols[c] for c in t.column_names}),
        os.path.join(out, "documents.parquet"),
    )
    print(f"wrote {out}/documents.parquet with {len(out_cols['doc_id'])} docs")
    return out


def run(sf_dir: str) -> None:
    from chewdata_spark.session import get_spark
    from chewdata_spark.queries import all_queries

    spark = get_spark("sa-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    results = {}
    for name in SA_HEADLINE:
        # construct-each, exactly the bench contract for these queries
        def one():
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"{name} @ {sf_dir}")
        one()  # warmup
        results[name] = min(one(), one())
        print(f"{name:40s} {results[name]:7.2f}s (cpus={cpus})", flush=True)
    print({"sf_dir": sf_dir, "cpus": cpus, "queries": results})
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(int(sys.argv[2]))
    else:
        run(sys.argv[2])
