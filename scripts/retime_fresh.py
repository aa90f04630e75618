"""Fresh-session re-times for named queries, with the dual host
probes stamped beside each number (judge r14/r15 protocol: a host-state
claim needs the CPU probe AND the IO probe, since a co-tenant can
degrade disk/page-cache/memory bandwidth without denting a pure-CPU
loop).

Each named query gets its OWN SparkSession in its OWN subprocess —
no accumulated JVM/JIT/state-store effects, the exact "fresh-session,
quiet host" condition the verdicts ask clean-host confirmations to be
measured under.  Prints one JSON line per query:

    {"name": ..., "t": ..., "calib": ..., "io_calib": ...,
     "floor": ..., "floor_calib": ..., "floor_io": ..., "ratio": ...}

Usage: python scripts/retime_fresh.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from chewdata_spark.session import get_spark
import bench

name = {name!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("retime-" + name)
spark.sparkContext.setLogLevel("ERROR")
calib = bench._calibration(spark)
io_calib = bench._io_calibration(spark)
from chewdata_spark.queries import all_queries
queries = all_queries()

def run():
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

if bench._construct_each(name):
    start = time.perf_counter(); run(); best = time.perf_counter() - start
    for _ in range(2):
        start = time.perf_counter(); run()
        best = min(best, time.perf_counter() - start)
else:
    df = queries[name](spark, sf_dir)
    if bench._construct_each(name, df):
        start = time.perf_counter(); run(); best = time.perf_counter() - start
        for _ in range(2):
            start = time.perf_counter(); run()
            best = min(best, time.perf_counter() - start)
    else:
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
print("RESULT " + json.dumps(
    {{"name": name, "t": round(best, 3),
      "calib": calib, "io_calib": io_calib}}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        detail = json.load(open(os.path.join(repo, "BENCH_DETAIL.json")))
    except Exception:
        detail = {}
    best = detail.get("best_ever", {}).get(sf, {})
    prov = detail.get("best_ever_calib", {}).get(sf, {})
    io_prov = detail.get("best_ever_io_calib", {}).get(sf, {})
    for name in sys.argv[1:]:
        code = _CHILD.format(repo=repo, name=name)
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1800,
        )
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("RESULT ")),
            None,
        )
        if not line:
            print(json.dumps({"name": name, "error": r.stderr[-500:]}))
            continue
        out = json.loads(line[len("RESULT "):])
        fl = best.get(name)
        out["floor"] = fl
        out["floor_calib"] = prov.get(name)
        out["floor_io"] = io_prov.get(name)
        out["ratio"] = round(out["t"] / fl, 2) if fl else None
        print(json.dumps(out))


if __name__ == "__main__":
    main()
