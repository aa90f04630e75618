"""The config compiler's streaming path: ``"stream": true`` on a
reader step turns the whole pipeline into a Structured Streaming job
(file-source stream -> stream-compiled curate steps -> foreachBatch
writer).  The golden contract throughout: an availableNow streaming
run returns EXACTLY what the batch pipeline returns on the same input,
for ANY micro-batch arrival order — which is why streaming exact_dedup
is a min_by stateful aggregation, not arrival-order dropDuplicates.

Reference: the execution model being mirrored is the reference's async
record channels between steps (src/lib.rs:85-89); the semantics are
the batch compiler's, already certified by curate_config_decontam_sa.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from chewdata_spark.pipeline import Pipeline
from chewdata_spark.streaming.ops import run_to_memory

SF = os.environ.get("CHEWDATA_TEST_SF_DIR", "/root/testdata/sf0.001")

_RUN = {"n": 0}


def _collect_stream(p: Pipeline, cols=None):
    df = p.dataframe()
    assert df.isStreaming
    if cols:
        df = df.select(*cols)
    _RUN["n"] += 1
    out = run_to_memory(
        df, f"_tsp_{_RUN['n']}", output_mode=p.stream_output_mode
    )
    return sorted(tuple(r) for r in out.collect())


def _curate_cfg(stream: bool) -> list[dict]:
    rd = {
        "type": "reader",
        "connector": {"type": "local",
                      "path": f"{SF}/documents.parquet"},
        "document": {"type": "parquet"},
    }
    if stream:
        rd["stream"] = True
    return [
        rd,
        {"type": "curate", "method": "language_filter", "lang": "en"},
        {"type": "curate", "method": "quality_filter", "min_quality": 0.6},
        {"type": "curate", "method": "classifier_filter",
         "key": "doc_id", "min_score": 0.46},
        {"type": "curate", "method": "exact_dedup", "key": "doc_id"},
    ]


def test_stream_config_matches_batch_config(spark):
    """THE golden: the same JSON config with and without the stream
    flag produces identical rows (the full 4-stage curation funnel,
    including the stateful exact_dedup aggregation)."""
    cols = ["doc_id", "lang", "source"]
    batch = sorted(
        tuple(r)
        for r in Pipeline(_curate_cfg(False), spark)
        .dataframe().select(*cols).collect()
    )
    got = _collect_stream(Pipeline(_curate_cfg(True), spark), cols)
    assert len(batch) > 0
    assert got == batch


def _write_docs(spark, tmpdir: str, rows, n_files: int = 1) -> str:
    """Plant documents as n_files SEPARATE parquet files under a dir,
    so maxFilesPerTrigger can slice them into distinct micro-batches."""
    path = os.path.join(tmpdir, "docs")
    per = max(1, (len(rows) + n_files - 1) // n_files)
    for i in range(0, len(rows), per):
        spark.createDataFrame(
            rows[i:i + per], "doc_id int, text string"
        ).coalesce(1).write.mode("append").parquet(path)
    return path


def test_stream_exact_dedup_min_key_across_batches(spark, tmp_path):
    """Survivor = min key per content signature even when the copies
    arrive in DIFFERENT micro-batches in unfavorable order (the larger
    key first): maxFilesPerTrigger=1 forces one file per batch, and the
    min_by complete-mode state still picks the batch-order-independent
    survivor — where dropDuplicates would have kept first-arrival."""
    rows = [
        (7, "dup one"), (9, "solo a"),      # file 1: larger dup key first
        (2, "dup one"), (8, "solo b"),      # file 2: the true survivor
        (5, "dup one"), (1, "dup two"),     # file 3
        (4, "dup two"),
    ]
    path = _write_docs(spark, str(tmp_path), rows, n_files=3)
    cfg = [
        {"type": "reader", "stream": True,
         "connector": {"type": "local", "path": path},
         "document": {"type": "parquet",
                      "options": {"maxFilesPerTrigger": "1"}}},
        {"type": "curate", "method": "exact_dedup", "key": "doc_id"},
    ]
    p = Pipeline(cfg, spark)
    got = _collect_stream(p, ["doc_id", "text"])
    assert p.stream_output_mode == "complete"
    assert got == [(1, "dup two"), (2, "dup one"), (8, "solo b"),
                   (9, "solo a")]


GOPHER_PASS = (
    "the quick brown fox jumps with and that have this they at for was "
    "over a lazy dog near the river bank while birds sing songs of the "
    "morning light and people walk their dogs along quiet streets with "
    "coffee in hand thinking about the day ahead and all the small "
    "things that make life feel steady and good every single morning"
)


def test_stream_gopher_filter_matches_batch(spark, tmp_path):
    """The per-row streaming gopher predicate keeps/drops the same docs
    as the batch gate-relation semi-join, on docs built to pass and
    fail specific Gopher rules."""
    rows = [
        (1, GOPHER_PASS),          # passes every rule
        (2, "too short"),          # fails the 50-word minimum
        (3, " ".join(["xqzt"] * 80)),  # fails stopword rule
    ]
    path = _write_docs(spark, str(tmp_path), rows)
    def cfg(stream):
        rd = {"type": "reader",
              "connector": {"type": "local", "path": path},
              "document": {"type": "parquet"}}
        if stream:
            rd["stream"] = True
        return [rd, {"type": "curate", "method": "gopher_filter",
                     "key": "doc_id"}]
    batch = sorted(
        tuple(r)
        for r in Pipeline(cfg(False), spark).dataframe().collect()
    )
    got = _collect_stream(Pipeline(cfg(True), spark))
    assert [r[0] for r in batch] == [1]
    assert got == batch


def test_stream_writer_foreach_batch_parquet(spark, tmp_path):
    """A writer step under a streaming reader goes through foreachBatch
    and lands the same parquet rows as the batch pipeline (run(), not
    just dataframe())."""
    out_dir = os.path.join(str(tmp_path), "out")
    cfg = _curate_cfg(True) + [
        {"type": "writer",
         "connector": {"type": "local", "path": out_dir},
         "document": {"type": "parquet"}},
    ]
    p = Pipeline(cfg, spark)
    _, writes = p.run()
    assert writes and writes[0].fmt == "parquet"
    written = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "lang", "source").collect()
    )
    batch = sorted(
        tuple(r)
        for r in Pipeline(_curate_cfg(False), spark)
        .dataframe().select("doc_id", "lang", "source").collect()
    )
    assert written == batch


def test_stream_rejects_non_stream_capable_method(spark):
    cfg = _curate_cfg(True)[:1] + [
        {"type": "curate", "method": "minhash_dedup", "key": "doc_id"},
    ]
    with pytest.raises(ValueError, match="not stream-capable"):
        Pipeline(cfg, spark).dataframe()


def test_stream_rejects_non_local_connector(spark):
    cfg = [{
        "type": "reader", "stream": True,
        "connector": {"type": "in_memory",
                      "data": json.dumps([{"a": 1}])},
    }]
    with pytest.raises(ValueError, match="local file readers"):
        Pipeline(cfg, spark).dataframe()


def test_stream_classifier_scores_bit_match_batch(spark, sf_dir):
    """The per-row fold score equals the relational path's rounded
    score doc-for-doc (FP summation order differs; 6-dp rounding
    absorbs it) — checked over the whole documents table, not just the
    filter survivors."""
    from chewdata_spark.operators.curation import (
        classifier_score_expr,
        hashed_classifier_score,
        synthetic_classifier_weights,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    w = synthetic_classifier_weights(spark, dim=256, salt="qw")
    rel = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_classifier_score(
            docs, "doc_id", "text", w, dim=256
        ).collect()
    }
    wmap = {int(r["dim"]): float(r["w"]) for r in w.collect()}
    fold = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", classifier_score_expr("text", wmap, 256).alias("s")
        ).collect()
    }
    assert fold == rel
