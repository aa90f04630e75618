"""Multimodal plumbing: schema, determinism, batch shapes (stub kernels)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chewdata_spark.operators.multimodal import (
    attach_metadata,
    decode_audio,
    fake_decode_audio,
    fake_decode_image,
    fake_extract_features,
    fake_frame_sample,
    fake_resize_image,
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


def test_fake_resize_normalizes_size(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"img-one")), (2, bytearray(b"img-two-longer"))],
        "id int, content binary",
    )
    out = fake_resize_image(df, width=8, height=8).collect()
    assert all(len(r.content) == 64 for r in out)
    # deterministic: same input bytes → same output
    out2 = fake_resize_image(df, width=8, height=8).collect()
    assert {bytes(r.content) for r in out} == {bytes(r.content) for r in out2}


def test_fake_decode_audio_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"wav-bytes")), (2, bytearray(b"other-aud"))],
        "id int, content binary",
    )
    out = fake_decode_audio(df)
    assert out.columns == ["id", "content", "sample_rate", "duration_ms", "n_channels"]
    rows = {r.id: (r.sample_rate, r.duration_ms, r.n_channels) for r in out.collect()}
    assert rows[1][0] in (8000, 16000, 22050, 44100) and rows[1][2] in (1, 2)
    rows2 = {r.id: (r.sample_rate, r.duration_ms, r.n_channels)
             for r in fake_decode_audio(df).collect()}
    assert rows == rows2


def test_real_and_fake_share_plumbing(spark, monkeypatch):
    """Contract: every real/fake twin builds through the SAME
    ``_media_stage`` plumbing (schema widening + mapInPandas); the two
    differ only in the kernel callable (the decode body)."""
    import chewdata_spark.operators.multimodal as M

    calls = []
    real_stage = M._media_stage

    def spy(df, extra_schema, kernel):
        calls.append(extra_schema)
        return real_stage(df, extra_schema, kernel)

    monkeypatch.setattr(M, "_media_stage", spy)
    df = spark.createDataFrame([(1, bytearray(b"img"))], "id int, content binary")
    for real, fake in (
        (M.decode_image, M.fake_decode_image),
        (M.resize_image, M.fake_resize_image),
        (M.decode_audio, M.fake_decode_audio),
    ):
        calls.clear()
        r, f = real(df), fake(df)
        # both routed through the one plumbing path with identical
        # widened schema → identical plan shape, swap-in kernel
        assert calls == [calls[0]] * 2
        assert r.schema == f.schema


def test_real_kernels_raise_only_in_kernel_body():
    """Kernel-level contract: the real kernels raise NotImplementedError
    from the kernel body itself (the lazy lib import) while the fake
    twins run on the identical pandas batch — everything outside the
    kernel body is shared code, not a parallel stub implementation."""
    import importlib.util

    import pandas as pd

    import chewdata_spark.operators.multimodal as M

    pdf = pd.DataFrame({"id": [1], "content": [b"payload-bytes"]})
    reals = []
    if importlib.util.find_spec("PIL") is None:
        reals += [M._pil_dims_kernel("content"), M._pil_resize_kernel("content", 8, 8)]
    if importlib.util.find_spec("soundfile") is None:
        reals.append(M._soundfile_audio_kernel("content"))
    for kernel in reals:
        with pytest.raises(NotImplementedError):
            kernel(pdf)
    out = M._fake_dims_kernel("content")(pdf)
    assert list(out["width"]) and list(out["height"])
    out = M._fake_audio_kernel("content")(pdf)
    assert out["sample_rate"][0] in (8000, 16000, 22050, 44100)


def test_real_audio_decode_raises_without_lib(spark):
    import importlib.util

    if importlib.util.find_spec("soundfile") is not None:
        pytest.skip("soundfile present; stub guard not applicable")
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id int, content binary")
    with pytest.raises(Exception) as ei:
        decode_audio(df).collect()
    assert "NotImplementedError" in str(ei.value) or "soundfile" in str(ei.value)
