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


def _png_bytes(w, h):
    import struct
    import zlib

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * (3 * w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_bytes(w, h):
    import struct

    row = (3 * w + 3) // 4 * 4
    pixels = (b"\x00" * row) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    return header + info + pixels


def _gif_bytes(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"


def _jpeg_bytes(w, h):
    import struct

    # SOI + APP0 + SOF0(h, w) + EOI — header-only, enough for dims
    app0_data = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", len(app0_data) + 2) + app0_data
    sof_data = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    sof = b"\xff\xc0" + struct.pack(">H", len(sof_data) + 2) + sof_data
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _ppm_bytes(w, h):
    px = bytes((x * 7 + y * 13 + c) % 256 for y in range(h) for x in range(w) for c in range(3))
    return b"P6\n%d %d\n255\n" % (w, h) + px


def test_decode_image_real_headers_no_pil(spark):
    """decode_image is REAL without PIL: header parsing covers the
    common containers."""
    from chewdata_spark.operators.multimodal import decode_image

    rows = [
        (1, bytearray(_png_bytes(640, 480))),
        (2, bytearray(_bmp_bytes(123, 45))),
        (3, bytearray(_gif_bytes(320, 200))),
        (4, bytearray(_jpeg_bytes(1920, 1080))),
        (5, bytearray(_ppm_bytes(17, 9))),
    ]
    df = spark.createDataFrame(rows, "img_id long, content binary")
    got = {r["img_id"]: (r["width"], r["height"]) for r in decode_image(df).collect()}
    assert got == {1: (640, 480), 2: (123, 45), 3: (320, 200), 4: (1920, 1080), 5: (17, 9)}


def test_resize_image_real_for_ppm(spark):
    """resize_image really resamples PPM rasters (numpy, no PIL):
    output parses back to the target dims and pixels come from the
    source raster."""
    from chewdata_spark.operators.multimodal import decode_image, image_dims, resize_image

    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(16, 8))), (2, bytearray(_ppm_bytes(5, 5)))],
        "img_id long, content binary",
    )
    out = resize_image(df, width=4, height=4)
    rows = {r["img_id"]: bytes(r["content"]) for r in out.collect()}
    assert all(image_dims(b) == (4, 4) for b in rows.values())
    # nearest-neighbor of the top-left pixel is the source's top-left
    src = _ppm_bytes(16, 8)
    src_first = src.split(b"255\n", 1)[1][:3]
    assert rows[1].split(b"255\n", 1)[1][:3] == src_first
    # decode_image composes with the resized output
    dims = {r["img_id"]: (r["width"], r["height"]) for r in decode_image(out).collect()}
    assert dims == {1: (4, 4), 2: (4, 4)}


def test_sample_frames_twin_contract(spark):
    """sample_frames / fake_sample_frames share the _frame_stage
    one-to-many plumbing: identical widened schema, kernel-only diff;
    the real kernel raises in the kernel body without PyAV."""
    import importlib.util

    import chewdata_spark.operators.multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(b"video-bytes-a")), (2, bytearray(b"video-bytes-b"))],
        "vid_id int, content binary",
    )
    real, fake = M.sample_frames(df, n_frames=3), M.fake_sample_frames(df, n_frames=3)
    assert real.schema == fake.schema
    rows = fake.collect()
    assert len(rows) == 6  # one row per (doc, frame)
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["vid_id"], []).append((r["frame_idx"], r["frame_ms"]))
    for frames in per_vid.values():
        idxs = sorted(i for i, _ in frames)
        assert idxs == [0, 1, 2]
        ts = [ms for _, ms in sorted(frames)]
        assert ts[0] == 0 and ts == sorted(ts)  # uniform ascending stamps
    # deterministic
    again = {(r["vid_id"], r["frame_idx"], bytes(r["frame"])) for r in fake.collect()}
    now = {(r["vid_id"], r["frame_idx"], bytes(r["frame"])) for r in rows}
    assert again == now
    if importlib.util.find_spec("av") is None:
        import pandas as pd
        import pytest

        with pytest.raises(NotImplementedError):
            M._av_frame_kernel("content", 3)(
                pd.DataFrame({"vid_id": [1], "content": [b"x"]})
            )


def test_dhash_known_gradient_and_invariances(spark):
    """dHash ground truth on hand-built rasters: a horizontal gradient
    sets every bit (left < right everywhere), a flat image sets none;
    container-level differences (a header comment) do not change the
    hash; resize path: a 18x16 upscale of the same gradient hashes
    identically to the 9x8 original (nearest-neighbor thumbnail)."""
    import chewdata_spark.operators.multimodal as M

    def ppm(w, h, pixel):
        head = b"P6\n%d %d\n255\n" % (w, h)
        body = bytes(
            v
            for i in range(h)
            for j in range(w)
            for v in pixel(i, j)
        )
        return head + body

    grad98 = ppm(9, 8, lambda i, j: (j * 20, j * 20, j * 20))
    flat98 = ppm(9, 8, lambda i, j: (7, 7, 7))
    grad_big = ppm(18, 16, lambda i, j: ((j // 2) * 20,) * 3)
    commented = b"P6\n# a comment\n9 8\n255\n" + grad98.split(b"255\n", 1)[1]

    df = spark.createDataFrame(
        [(1, bytearray(grad98)), (2, bytearray(flat98)),
         (3, bytearray(grad_big)), (4, bytearray(commented))],
        "img_id int, content binary",
    )
    got = {r["img_id"]: r["dhash"] for r in M.dhash_image(df, "content").collect()}
    assert got[1] == "f" * 16  # every adjacent pair ascends -> all 64 bits
    assert got[2] == "0" * 16  # flat -> no bit
    assert got[3] == got[1]    # thumbnail invariance under 2x upscale
    assert got[4] == got[1]    # header comment is not content
