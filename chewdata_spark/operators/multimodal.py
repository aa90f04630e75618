"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal corpora:

- Content is an opaque ``binary`` column (never parsed JVM-side); typed
  metadata (mime, dims, duration) travels in a sibling struct so
  filters/pruning work on metadata without touching bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes cross to Python once per batch, heavy
  libs (PIL/ffmpeg/librosa) are imported lazily per executor.
- This container has no media libraries, so the *decode kernels* are
  STUBS: ``decode_image`` raises ``NotImplementedError`` unless PIL is
  importable, and the deterministic-fake variants (``fake_*``) derive
  features from the bytes' hash — schema, batching, partitioning and
  UDF signatures are real and tested; swap the kernel body in
  production.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "content binary, meta struct<mime: string, width: int, height: int, duration_ms: int>"


def attach_metadata(df: DataFrame, content_col: str, mime: str) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (unknown dims
    until decode).  Metadata-only predicates then prune without reading
    bytes (parquet column pruning)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def _media_stage(df: DataFrame, extra_schema: str, kernel) -> DataFrame:
    """The single Arrow plumbing path every media kernel — real or fake —
    runs through: schema widening, ``mapInPandas`` batch iteration,
    partition preservation.  A kernel is ``(pandas.DataFrame) ->
    pandas.DataFrame``; real and fake twins differ ONLY in the kernel
    body (the decode call), pinned by
    tests/test_multimodal.py::test_real_and_fake_share_plumbing."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    if extra_schema:
        out_schema += ", " + extra_schema

    def gen(batches):
        for pdf in batches:
            yield kernel(pdf)

    return df.mapInPandas(gen, out_schema)


def _pil_dims_kernel(content_col: str):
    """Real image-decode kernel: PIL dims.  Import is lazy per executor
    batch; without PIL it raises NotImplementedError at execution."""

    def kernel(pdf):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL; use fake_decode_image for plumbing tests"
            ) from e
        import io

        dims = [Image.open(io.BytesIO(bytes(b))).size for b in pdf[content_col]]
        pdf = pdf.copy()
        pdf["width"] = [d[0] for d in dims]
        pdf["height"] = [d[1] for d in dims]
        return pdf

    return kernel


def _fake_dims_kernel(content_col: str):
    """Deterministic stand-in decode kernel: dims from sha256(bytes)."""

    def kernel(pdf):
        h = [hashlib.sha256(bytes(b)).digest() for b in pdf[content_col]]
        pdf = pdf.copy()
        pdf["width"] = [16 + d[0] % 1024 for d in h]
        pdf["height"] = [16 + d[1] % 1024 for d in h]
        return pdf

    return kernel


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Decode image bytes → (id-preserving columns..., width, height).

    Real kernel requires PIL; raises NotImplementedError without it.
    """
    return _media_stage(df, "width int, height int", _pil_dims_kernel(content_col))


def fake_decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic stand-in decode — identical plumbing (same
    :func:`_media_stage`, same schema), only the kernel differs."""
    return _media_stage(df, "width int, height int", _fake_dims_kernel(content_col))


def _pil_resize_kernel(content_col: str, width: int, height: int):
    """Real resize kernel: PIL resize → JPEG re-encode."""

    def kernel(pdf):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image resize requires PIL; use fake_resize_image for plumbing tests"
            ) from e
        import io

        out = []
        for b in pdf[content_col]:
            im = Image.open(io.BytesIO(bytes(b))).resize((width, height))
            buf = io.BytesIO()
            im.save(buf, format="JPEG")
            out.append(buf.getvalue())
        pdf = pdf.copy()
        pdf[content_col] = out
        return pdf

    return kernel


def _fake_resize_kernel(content_col: str, width: int, height: int):
    """Stand-in resize kernel: hash-seeded buffer of width*height bytes."""
    target = width * height

    def kernel(pdf):
        out = []
        for b in pdf[content_col]:
            seed = hashlib.sha256(bytes(b)).digest()
            out.append((seed * (target // len(seed) + 1))[:target])
        pdf = pdf.copy()
        pdf[content_col] = out
        return pdf

    return kernel


def resize_image(
    df: DataFrame, content_col: str = "content", *, width: int = 224, height: int = 224
) -> DataFrame:
    """Resize image bytes to (width, height) JPEG — requires PIL."""
    return _media_stage(df, "", _pil_resize_kernel(content_col, width, height))


def fake_resize_image(
    df: DataFrame, content_col: str = "content", *, width: int = 224, height: int = 224
) -> DataFrame:
    """Deterministic stand-in resize — identical plumbing
    (:func:`_media_stage`, schema-preserving), only the kernel differs."""
    return _media_stage(df, "", _fake_resize_kernel(content_col, width, height))


_AUDIO_SCHEMA = "sample_rate int, duration_ms int, n_channels int"


def _soundfile_audio_kernel(content_col: str):
    """Real audio-probe kernel: soundfile header read."""

    def kernel(pdf):
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "audio decode requires soundfile; use fake_decode_audio for plumbing tests"
            ) from e
        import io

        rates, durs, chans = [], [], []
        for b in pdf[content_col]:
            info = soundfile.info(io.BytesIO(bytes(b)))
            rates.append(int(info.samplerate))
            durs.append(int(info.duration * 1000))
            chans.append(int(info.channels))
        pdf = pdf.copy()
        pdf["sample_rate"] = rates
        pdf["duration_ms"] = durs
        pdf["n_channels"] = chans
        return pdf

    return kernel


def _fake_audio_kernel(content_col: str):
    """Stand-in audio probe kernel: rate/duration/channels from hash."""

    def kernel(pdf):
        h = [hashlib.sha256(bytes(b)).digest() for b in pdf[content_col]]
        pdf = pdf.copy()
        pdf["sample_rate"] = [(8000, 16000, 22050, 44100)[d[2] % 4] for d in h]
        pdf["duration_ms"] = [100 + int.from_bytes(d[3:6], "big") % 600000 for d in h]
        pdf["n_channels"] = [1 + d[6] % 2 for d in h]
        return pdf

    return kernel


def decode_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Audio bytes → (…, sample_rate, duration_ms, n_channels).
    Real kernel needs soundfile/librosa; raises without them."""
    return _media_stage(df, _AUDIO_SCHEMA, _soundfile_audio_kernel(content_col))


def fake_decode_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic stand-in audio probe — identical plumbing
    (:func:`_media_stage`, same widened schema), only the kernel differs."""
    return _media_stage(df, _AUDIO_SCHEMA, _fake_audio_kernel(content_col))


def fake_extract_features(
    df: DataFrame, content_col: str = "content", *, dim: int = 64
) -> DataFrame:
    """Deterministic fake embedding (unit-norm float32[dim] from the
    content hash) — the plumbing for a real vision/audio encoder.
    Output feeds directly into the similarity operators."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", features array<float>"

    def gen(batches):
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                seed = int.from_bytes(hashlib.sha256(bytes(b)).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype(np.float32)
                feats.append((v / np.linalg.norm(v)).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(gen, out_schema)


def fake_frame_sample(
    df: DataFrame, content_col: str = "content", *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Deterministic fake frame sampler: one "frame" (byte chunk) per
    stride — the explode-shaped plumbing of real video frame sampling
    (one row per frame, frame_idx column)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != content_col
    )
    out_schema += ", frame_idx int, frame binary"

    def gen(batches):
        for pdf in batches:
            rows = {c: [] for c in pdf.columns if c != content_col}
            idxs, frames = [], []
            for _, row in pdf.iterrows():
                blob = bytes(row[content_col])
                n = min(max_frames, max(1, len(blob) // every_n_bytes))
                for i in range(n):
                    for c in rows:
                        rows[c].append(row[c])
                    idxs.append(i)
                    frames.append(blob[i * every_n_bytes : (i + 1) * every_n_bytes])
            import pandas as pd

            out = pd.DataFrame(rows)
            out["frame_idx"] = idxs
            out["frame"] = frames
            yield out

    return df.mapInPandas(gen, out_schema)
