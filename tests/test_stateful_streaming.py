"""Cross-batch stateful dedup: duplicates arriving in LATER batches drop."""

from __future__ import annotations

import json

from chewdata_spark.streaming.ops import run_to_memory
from chewdata_spark.streaming.stateful import stream_dedup


def test_stream_dedup_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # batch 1: keys a,b ; batch 2: duplicate a + new c ; batch 3: dup b,c + new d
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in [
        {"k": "a", "v": 1}, {"k": "b", "v": 2}]))
    (d / "b2.json").write_text("\n".join(json.dumps(r) for r in [
        {"k": "a", "v": 99}, {"k": "c", "v": 3}]))
    (d / "b3.json").write_text("\n".join(json.dumps(r) for r in [
        {"k": "b", "v": 98}, {"k": "c", "v": 97}, {"k": "d", "v": 4}]))
    # the file source orders micro-batches by modification time — make it explicit
    import os, time

    now = time.time()
    for i, f in enumerate(["b1.json", "b2.json", "b3.json"]):
        os.utime(d / f, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .json(str(d))
    )
    res = run_to_memory(stream_dedup(stream, ["k"]), "dedup_stream")
    rows = {r.k: r.v for r in res.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    # first-seen values won (duplicates with v=99/98/97 dropped)
    assert rows["a"] == 1 and rows["b"] == 2 and rows["c"] == 3 and rows["d"] == 4
