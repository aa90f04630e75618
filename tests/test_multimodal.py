"""Multimodal plumbing: schema, determinism, batch shapes (stub kernels)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chewdata_spark.operators.multimodal import (
    attach_metadata,
    fake_decode_image,
    fake_extract_features,
    fake_frame_sample,
)
from chewdata_spark.tables import load_table


def _binary_docs(spark, sf_dir, n=50):
    docs = load_table(spark, sf_dir, "documents").limit(n)
    return docs.select("doc_id", F.encode("text", "utf-8").alias("content"))


def test_attach_metadata_schema(spark, sf_dir):
    df = attach_metadata(_binary_docs(spark, sf_dir), "content", "image/png")
    meta = df.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["mime", "width", "height", "duration_ms"]
    assert df.filter(F.col("meta.mime") == "image/png").count() == df.count()


def test_fake_decode_deterministic(spark, sf_dir):
    df = _binary_docs(spark, sf_dir)
    a = {r.doc_id: (r.width, r.height) for r in fake_decode_image(df).collect()}
    b = {r.doc_id: (r.width, r.height) for r in fake_decode_image(df.repartition(7)).collect()}
    assert a == b and len(a) == 50
    assert all(16 <= w < 1040 and 16 <= h < 1040 for w, h in a.values())


def test_fake_features_feed_similarity(spark, sf_dir):
    """Extracted features are consumable by the similarity operators."""
    from chewdata_spark.operators.similarity import cosine_topk

    df = fake_extract_features(_binary_docs(spark, sf_dir), dim=16)
    emb = df.select(F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding"))
    topk = cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    assert topk.count() == 6
    assert topk.schema["sim"].dataType.typeName() == "double"


def test_fake_frame_sample_explodes(spark, sf_dir):
    df = _binary_docs(spark, sf_dir)
    frames = fake_frame_sample(df, every_n_bytes=64, max_frames=4)
    assert "content" not in frames.columns
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    total_docs = df.count()
    assert frames.select("doc_id").distinct().count() == total_docs
