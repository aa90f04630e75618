"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal corpora:

- Content is an opaque ``binary`` column (never parsed JVM-side); typed
  metadata (mime, dims, duration) travels in a sibling struct so
  filters/pruning work on metadata without touching bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes cross to Python once per batch, heavy
  libs (PIL/ffmpeg/librosa) are imported lazily per executor.
- ``decode_image`` is REAL without any media library: container
  headers (PNG/GIF/BMP/JPEG/PPM) carry the dimensions, parsed in pure
  Python; ``resize_image`` is real for uncompressed PPM rasters
  (numpy nearest-neighbor).  PIL is needed only for compressed-pixel
  work (JPEG/PNG resize) and audio/video kernels still stub without
  their libs — the deterministic-fake twins (``fake_*``) share the
  identical Arrow plumbing for those paths.
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


def image_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from the container header — pure Python, no
    imaging library: PNG IHDR, GIF logical screen, BMP info header,
    JPEG SOF scan, PPM/PGM ASCII header.  Raises ValueError on formats
    without a parseable header (then the kernel falls back to PIL)."""
    import re as _re
    import struct

    if b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return w, h
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h
    if b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return w, abs(h)  # negative height = top-down rows
    if b[:2] == b"\xff\xd8":  # JPEG: find a start-of-frame marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seg_len
        raise ValueError("JPEG without SOF marker")
    if b[:2] in (b"P5", b"P6"):
        m = _re.match(rb"P[56]\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)", b)
        if m:
            return int(m.group(1)), int(m.group(2))
    raise ValueError(f"unrecognized image container: {b[:8]!r}")


def _dims_kernel(content_col: str):
    """Real image-decode kernel: container-header dims in pure Python
    (PNG/GIF/BMP/JPEG/PPM need no imaging library), PIL only for
    containers the header parser does not know."""

    def kernel(pdf):
        def one(b: bytes) -> tuple[int, int]:
            try:
                return image_dims(bytes(b))
            except ValueError:
                try:
                    from PIL import Image
                except ImportError as e:
                    raise NotImplementedError(
                        "unknown container and PIL unavailable; "
                        "use fake_decode_image for plumbing tests"
                    ) from e
                import io

                return Image.open(io.BytesIO(bytes(b))).size

        dims = [one(b) for b in pdf[content_col]]
        pdf = pdf.copy()
        pdf["width"] = [d[0] for d in dims]
        pdf["height"] = [d[1] for d in dims]
        return pdf

    return kernel


# kept under its historical name for the shared-plumbing contract test
_pil_dims_kernel = _dims_kernel


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

    Pure-Python header parsing for PNG/GIF/BMP/JPEG/PPM — no imaging
    library; PIL only for containers the parser does not know.
    """
    return _media_stage(df, "width int, height int", _dims_kernel(content_col))


def fake_decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic stand-in decode — identical plumbing (same
    :func:`_media_stage`, same schema), only the kernel differs."""
    return _media_stage(df, "width int, height int", _fake_dims_kernel(content_col))


def ppm_resize(b: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a binary P6 PPM — numpy only.  The
    uncompressed-raster path that needs no imaging library; compressed
    containers go through PIL in the kernel below."""
    import re as _re

    import numpy as np

    m = _re.match(rb"(P6)\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", b)
    if not m:
        raise ValueError("not a binary P6 PPM")
    w, h, maxv = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxv > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=m.end()).reshape(h, w, 3)
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    out = px[ys][:, xs]
    return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()


def _resize_kernel(content_col: str, width: int, height: int):
    """Real resize kernel: numpy nearest-neighbor for binary PPM
    rasters, PIL resize → JPEG re-encode for compressed containers."""

    def kernel(pdf):
        def one(raw) -> bytes:
            b = bytes(raw)
            if b[:2] == b"P6":
                return ppm_resize(b, width, height)
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "compressed-image resize requires PIL; "
                    "use fake_resize_image for plumbing tests"
                ) from e
            import io

            im = Image.open(io.BytesIO(b)).resize((width, height))
            buf = io.BytesIO()
            im.save(buf, format="JPEG")
            return buf.getvalue()

        pdf = pdf.copy()
        pdf[content_col] = [one(b) for b in pdf[content_col]]
        return pdf

    return kernel


# kept under its historical name for the shared-plumbing contract test
_pil_resize_kernel = _resize_kernel


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
    """Resize image bytes to (width, height): numpy nearest-neighbor
    for binary PPM, PIL (JPEG re-encode) for compressed containers."""
    return _media_stage(df, "", _resize_kernel(content_col, width, height))


def fake_resize_image(
    df: DataFrame, content_col: str = "content", *, width: int = 224, height: int = 224
) -> DataFrame:
    """Deterministic stand-in resize — identical plumbing
    (:func:`_media_stage`, schema-preserving), only the kernel differs."""
    return _media_stage(df, "", _fake_resize_kernel(content_col, width, height))


def _dhash_kernel(content_col: str):
    """Real perceptual-hash kernel: difference hash (dHash) over a
    9x8 nearest-neighbor thumbnail.  Pure numpy for binary P6 PPM
    rasters (:func:`ppm_resize` + integer-average grayscale
    ``(r+g+b)//3`` — integer math end-to-end so the hash is
    bit-replayable outside Spark); PIL grayscale for compressed
    containers.  Bit k (row ``i``, col ``j``, ``k = i*8+j``) is set
    when ``gray[i][j] < gray[i][j+1]``; the 64-bit value is emitted as
    16 lowercase hex chars."""

    def kernel(pdf):
        import numpy as np

        def one(raw) -> str:
            b = bytes(raw)
            if b[:2] == b"P6":
                rb = ppm_resize(b, 9, 8)
                px = np.frombuffer(
                    rb, dtype=np.uint8, count=216, offset=len(b"P6\n9 8\n255\n")
                ).reshape(8, 9, 3)
                gray = px.astype(np.int32).sum(axis=2) // 3
            else:
                try:
                    from PIL import Image
                except ImportError as e:
                    raise NotImplementedError(
                        "compressed-image dhash requires PIL; "
                        "P6 PPM rasters hash without it"
                    ) from e
                import io

                im = Image.open(io.BytesIO(b)).convert("L").resize((9, 8))
                gray = np.asarray(im, dtype=np.int32)
            bits = (gray[:, :-1] < gray[:, 1:]).flatten()
            v = 0
            for k, bit in enumerate(bits):
                v |= int(bit) << k
            return "%016x" % v

        pdf = pdf.copy()
        pdf["dhash"] = [one(b) for b in pdf[content_col]]
        return pdf

    return kernel


def dhash_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Perceptual difference-hash of every image — the LAION-style
    image-dedup primitive: identical/near-identical rasters collapse to
    one 64-bit bucket regardless of byte-level differences in the
    container.  Arrow-batched via the shared :func:`_media_stage`
    plumbing; downstream dedup is an ordinary ``groupBy("dhash")``
    (one shuffle on a 16-char key — the same shape as exact text
    dedup, so it holds at 100 TB)."""
    return _media_stage(df, "dhash string", _dhash_kernel(content_col))


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


_FRAME_SCHEMA = "frame_idx int, frame_ms int, frame binary"


def _frame_stage(df: DataFrame, kernel) -> DataFrame:
    """Arrow plumbing for ONE-TO-MANY media kernels (frame sampling):
    like :func:`_media_stage` but a kernel may return multiple output
    rows per input row (each input's columns replicated per frame).
    Real and fake kernels share this path; only the decode differs."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema += ", " + _FRAME_SCHEMA

    def gen(batches):
        for pdf in batches:
            yield kernel(pdf)

    return df.mapInPandas(gen, out_schema)


def _av_frame_kernel(content_col: str, n_frames: int):
    """Real video frame sampler: decode with PyAV/ffmpeg, grab
    ``n_frames`` uniformly spaced frames as raw RGB24 bytes.

    Decodes the stream once and indexes uniformly — correct for any
    codec; keyframe-seek sampling is the optimization when inputs are
    long (this kernel's contract is the row shape, shared with the
    fake twin)."""

    def kernel(pdf):
        try:
            import av
        except ImportError as e:
            raise NotImplementedError(
                "video frame sampling requires PyAV/ffmpeg; "
                "use fake_sample_frames for plumbing tests"
            ) from e
        import io

        import pandas as pd

        rows = []
        for _, row in pdf.iterrows():
            b = bytes(row[content_col])
            with av.open(io.BytesIO(b)) as container:
                stream = container.streams.video[0]
                frames = list(container.decode(stream))
            if not frames:
                continue
            step_idx = [
                (len(frames) - 1) * i // max(n_frames - 1, 1)
                for i in range(min(n_frames, len(frames)))
            ]
            for j, fi in enumerate(dict.fromkeys(step_idx)):
                fr = frames[fi]
                out = dict(row)
                out["frame_idx"] = j
                out["frame_ms"] = int((fr.time or 0.0) * 1000)
                out["frame"] = fr.to_ndarray(format="rgb24").tobytes()
                rows.append(out)
        return pd.DataFrame(
            rows, columns=list(pdf.columns) + ["frame_idx", "frame_ms", "frame"]
        )

    return kernel


def _fake_frame_kernel(content_col: str, n_frames: int):
    """Deterministic stand-in sampler: per-content duration from the
    hash, ``n_frames`` uniform timestamps, 32-byte pseudo-frames from
    sha256(content || frame_idx) — same one-to-many row shape as a real
    decoder."""

    def kernel(pdf):
        import pandas as pd

        rows = []
        for _, row in pdf.iterrows():
            b = bytes(row[content_col])
            dur = 1000 + int.from_bytes(hashlib.sha256(b).digest()[:3], "big") % 60000
            for i in range(n_frames):
                ms = (dur * i) // max(n_frames, 1)
                frame = hashlib.sha256(b + i.to_bytes(4, "big")).digest()
                out = dict(row)
                out["frame_idx"] = i
                out["frame_ms"] = ms
                out["frame"] = frame
                rows.append(out)
        return pd.DataFrame(rows, columns=list(pdf.columns) + ["frame_idx", "frame_ms", "frame"])

    return kernel


def sample_frames(
    df: DataFrame, content_col: str = "content", *, n_frames: int = 4
) -> DataFrame:
    """Video bytes → one row per sampled frame (uniform timestamps):
    (…, frame_idx, frame_ms, frame).  Real kernel needs PyAV/ffmpeg;
    raises without them."""
    return _frame_stage(df, _av_frame_kernel(content_col, n_frames))


def fake_sample_frames(
    df: DataFrame, content_col: str = "content", *, n_frames: int = 4
) -> DataFrame:
    """Deterministic stand-in frame sampler — identical one-to-many
    plumbing (:func:`_frame_stage`), only the kernel differs."""
    return _frame_stage(df, _fake_frame_kernel(content_col, n_frames))
