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


def test_stream_dedup_ttl_evicts_state(spark, tmp_path):
    """With a (tiny) TTL, a key untouched past the deadline is evicted,
    so a later duplicate counts as first-seen again — and state stays
    bounded for unbounded key spaces."""
    import os
    import time

    d = tmp_path / "in_ttl"
    d.mkdir()
    # batch 1: key a ; batch 2: unrelated key x (triggers the timeout
    # sweep — a's 1 ms TTL has long expired) ; batch 3: duplicate a
    (d / "b1.json").write_text(json.dumps({"k": "a", "v": 1}))
    (d / "b2.json").write_text(json.dumps({"k": "x", "v": 2}))
    (d / "b3.json").write_text(json.dumps({"k": "a", "v": 3}))
    now = time.time()
    for i, f in enumerate(["b1.json", "b2.json", "b3.json"]):
        os.utime(d / f, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    # a continuously-running query: processing-time timeouts only fire
    # on a subsequent trigger, so availableNow would end too early (or
    # never, with timeouts pending) — poll the sink instead
    q = (
        stream_dedup(stream, ["k"], ttl_ms=1)
        .writeStream.format("memory")
        .queryName("dedup_ttl_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        a_vals: list = []
        while time.time() < deadline:
            a_vals = sorted(r.v for r in spark.table("dedup_ttl_stream").collect() if r.k == "a")
            if len(a_vals) >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # both occurrences of `a` emitted: state was evicted between batches
    assert a_vals == [1, 3]


def test_stream_dedup_no_ttl_keeps_state(spark, tmp_path):
    """Control: without TTL the later duplicate still drops (same file
    layout as the TTL test)."""
    import os
    import time

    d = tmp_path / "in_nottl"
    d.mkdir()
    (d / "b1.json").write_text(json.dumps({"k": "a", "v": 1}))
    (d / "b2.json").write_text(json.dumps({"k": "x", "v": 2}))
    (d / "b3.json").write_text(json.dumps({"k": "a", "v": 3}))
    now = time.time()
    for i, f in enumerate(["b1.json", "b2.json", "b3.json"]):
        os.utime(d / f, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    res = run_to_memory(stream_dedup(stream, ["k"]), "dedup_nottl_stream")
    a_vals = [r.v for r in res.collect() if r.k == "a"]
    assert a_vals == [1]
