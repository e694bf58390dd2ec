"""Multimodal columns: image/audio/video as opaque binary + typed meta.

The training-data-pipeline pattern (SURVEY 2.7 / graft axes): media
payloads travel as ``content: binary`` with a typed ``meta`` struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing — schemas, partitioning,
UDF signatures, batch shapes — is REAL and tested; the codec itself is
STUBBED (this container has no PIL/ffmpeg): payloads with the
``FAKE`` magic header decode deterministically, anything else raises
``NotImplementedError`` exactly where a real ``PIL.Image.open`` /
``soundfile.read`` / ``av.open`` call would plug in (gated behind an
import-try so adding the libs lights up real decode with no schema
change).

Scale notes: decode stages are the widest rows in the pipeline — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small enough that
(batch x decoded pixels) fits executor memory; repartition by a
bucket of the media key beforehand so hot keys spread; never collect
pixel arrays to the driver.
"""
from __future__ import annotations

import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType,
                               IntegerType, StringType, StructField,
                               StructType)

try:  # real codecs light up automatically when present
    from PIL import Image as _PIL_Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # audio: WAV / FLAC / OGG via libsndfile
    import soundfile as _soundfile  # noqa: F401
    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

try:  # video: MP4 / MKV / WebM via ffmpeg bindings
    import av as _av  # noqa: F401
    _HAVE_AV = True
except ImportError:
    _HAVE_AV = False

_MAGIC = b"FAKE"

META_SCHEMA = StructType([
    StructField("format", StringType()),       # 'fake-img'|'fake-audio'|'fake-video'|'png'|...
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),  # audio only
    StructField("n_frames", IntegerType()),     # video only
])

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("modality", StringType()),      # image|audio|video
    StructField("content", BinaryType()),
    StructField("meta", META_SCHEMA),
])


# --------------------------------------------------------------------------
# deterministic synthetic payloads (pure function of media_ref)
# --------------------------------------------------------------------------

def _fake_payload(ref: str) -> tuple[str, bytes, tuple]:
    """Deterministic (modality, content, meta-tuple) for a media ref.

    Layout: b'FAKE' + uint8 modality + header uint16s + uint8 samples,
    samples[i] = (seed*31 + i*7) % 251. Small on purpose — the point is
    exercising binary-column plumbing, not storage.
    """
    seed = sum(ref.encode()) % 9973
    kind = seed % 3
    if kind == 0:
        w, h, c = 8 + seed % 8, 8 + (seed // 8) % 8, 3
        n = w * h * c
        head = _struct.pack(">4sBHHH", _MAGIC, 0, w, h, c)
        meta = ("fake-img", w, h, c, None, None)
        modality = "image"
    elif kind == 1:
        sr, n = 16000, 64 + seed % 64
        head = _struct.pack(">4sBHH", _MAGIC, 1, sr // 100, n)
        meta = ("fake-audio", None, None, 1, sr, None)
        modality = "audio"
    else:
        w, h, nf = 8, 8, 4 + seed % 4
        n = w * h * nf
        head = _struct.pack(">4sBHHH", _MAGIC, 2, w, h, nf)
        meta = ("fake-video", w, h, 1, None, nf)
        modality = "video"
    samples = ((seed * 31 + np.arange(n) * 7) % 251).astype(np.uint8)
    return modality, head + samples.tobytes(), meta


def generate_media(spark: SparkSession, refs: DataFrame | None = None,
                   n: int = 1024, dedup_refs: bool = True) -> DataFrame:
    """Media table keyed by media_ref (joins against docs' media spans).

    Distributed: payloads are a pure function of the ref, built per
    Arrow batch; no driver-side materialization.

    Pass ``dedup_refs=False`` when the ref set is already unique: the
    distinct's shuffle output is AQE-coalesced by BYTE size, and media
    refs are tiny strings — a 20k-ref layer collapses to ONE partition,
    serializing the (expensive-per-row) downstream Python decode. The
    classic cheap-rows/expensive-UDF mismatch; skipping the distinct
    lets the caller's partitioning reach mapInPandas unchanged.
    """
    if refs is None:
        refs = spark.range(n).select(
            F.concat(F.lit("raster://tile/"), F.col("id")).alias("media_ref"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [(_fake_payload(r)) for r in b["media_ref"]]
            yield pd.DataFrame({
                "media_ref": b["media_ref"].to_numpy(),
                "modality": [r[0] for r in rows],
                "content": [r[1] for r in rows],
                "meta": [{"format": m[0], "width": m[1], "height": m[2],
                          "channels": m[3], "sample_rate": m[4],
                          "n_frames": m[5]}
                         for m in (r[2] for r in rows)],
            })

    refs = refs.select("media_ref")
    if dedup_refs:
        refs = refs.distinct()
    return refs.mapInPandas(gen, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def _sniff_container(content: bytes) -> str:
    """Container sniff by magic bytes -> 'image' | 'audio' | 'video' |
    'unknown'. Real payloads carry no engine-side modality tag; the
    byte signature decides which codec family handles the row."""
    if (content[:8] == b"\x89PNG\r\n\x1a\n" or content[:2] == b"\xff\xd8"
            or content[:6] in (b"GIF87a", b"GIF89a")
            or content[:2] == b"BM"
            or (content[:4] == b"RIFF" and content[8:12] == b"WEBP")):
        return "image"
    if ((content[:4] == b"RIFF" and content[8:12] == b"WAVE")
            or content[:4] == b"fLaC" or content[:4] == b"OggS"):
        return "audio"
    if content[4:8] == b"ftyp" or content[:4] == b"\x1aE\xdf\xa3":
        return "video"
    return "unknown"


def _decode_real(content: bytes) -> tuple[int, np.ndarray, tuple]:
    """Real-codec decode path (import-try gated): PIL for images,
    soundfile for audio, av (ffmpeg) for video. Each family raises
    NotImplementedError naming the missing library when its codec is
    absent — the container this engine is developed in ships none of
    them, so the FAKE codec carries all tests; the Spark-side plumbing
    (schema, Arrow batch shape, sample layout) is identical either way.

    Layout contracts match the FAKE codec: image samples are row-major
    (height, width, channels) raveled in [0,1); audio samples are
    mono-mixed and shifted from [-1,1] to [0,1); video samples are
    per-frame mean-channel luma raveled frame-major."""
    kind = _sniff_container(content)
    if kind == "image":
        if not _HAVE_PIL:
            raise NotImplementedError(
                "image decode needs PIL (not in container); "
                f"got {len(content)}-byte image payload")
        import io
        img = _PIL_Image.open(io.BytesIO(content))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return 0, arr.ravel(), (img.width, img.height,
                                len(img.getbands()))
    if kind == "audio":
        if not _HAVE_SOUNDFILE:
            raise NotImplementedError(
                "audio decode needs soundfile (not in container); "
                f"got {len(content)}-byte audio payload")
        import io
        data, sr = _soundfile.read(io.BytesIO(content), dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        samples = np.clip((data + 1.0) / 2.0, 0.0, np.nextafter(1.0, 0.0))
        return 1, samples.astype(np.float32), (int(sr), len(samples), 1)
    if kind == "video":
        if not _HAVE_AV:
            raise NotImplementedError(
                "video decode needs av/ffmpeg (not in container); "
                f"got {len(content)}-byte video payload")
        import io
        frames = []
        w = h = 0
        with _av.open(io.BytesIO(content)) as cont:
            for frame in cont.decode(video=0):
                arr = frame.to_ndarray(format="rgb24").astype(np.float32)
                w, h = frame.width, frame.height
                frames.append((arr / 255.0).mean(axis=2).ravel())
        body = (np.concatenate(frames) if frames
                else np.empty(0, dtype=np.float32))
        return 2, body.astype(np.float32), (w, h, len(frames))
    raise NotImplementedError(
        "unrecognized media container (no FAKE header, no known "
        f"image/audio/video magic) in {len(content)}-byte payload")


def _decode_samples(content: bytes) -> tuple[int, np.ndarray, tuple]:
    """content -> (modality_code, float32 samples in [0,1), header dims)."""
    if content[:4] != _MAGIC:
        return _decode_real(content)
    kind = content[4]
    if kind == 0:
        w, h, c = _struct.unpack(">HHH", content[5:11])
        body = content[11:]
        dims = (w, h, c)
    elif kind == 1:
        sr100, n = _struct.unpack(">HH", content[5:9])
        body = content[9:]
        dims = (sr100 * 100, n, 1)
    else:
        w, h, nf = _struct.unpack(">HHH", content[5:11])
        body = content[11:]
        dims = (w, h, nf)
    samples = np.frombuffer(body, dtype=np.uint8).astype(np.float32) / 255.0
    return kind, samples, dims


DECODED_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("modality", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("samples", ArrayType(FloatType())),
])


def decode_media(media: DataFrame) -> DataFrame:
    """binary content -> float sample arrays (the decode stage)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_ref": [], "modality": [], "width": [],
                   "height": [], "channels": [], "samples": []}
            for ref, mod, content in zip(b["media_ref"], b["modality"],
                                         b["content"]):
                _, samples, dims = _decode_samples(bytes(content))
                out["media_ref"].append(ref)
                out["modality"].append(mod)
                out["width"].append(dims[0] if mod != "audio" else None)
                out["height"].append(dims[1] if mod != "audio" else None)
                out["channels"].append(dims[2])
                out["samples"].append(samples)
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, DECODED_SCHEMA)


# --------------------------------------------------------------------------
# feature extraction — JVM-side on the decoded arrays (no Python)
# --------------------------------------------------------------------------

def media_features(decoded: DataFrame) -> DataFrame:
    """Per-item sample statistics via built-in higher-order functions —
    stays in whole-stage codegen, no UDF."""
    s = F.col("samples")
    n = F.size(s).cast("double")
    mean = F.aggregate(s, F.lit(0.0),
                       lambda acc, v: acc + v.cast("double")) / n
    m2 = F.aggregate(s, F.lit(0.0),
                     lambda acc, v: acc + v.cast("double") * v.cast("double")) / n
    return decoded.select(
        "media_ref", "modality",
        n.cast("int").alias("n_samples"),
        mean.alias("sample_mean"),
        F.sqrt(F.greatest(m2 - mean * mean, F.lit(0.0))).alias("sample_std"),
        F.array_min(s).cast("double").alias("sample_min"),
        F.array_max(s).cast("double").alias("sample_max"),
    )


# --------------------------------------------------------------------------
# resize (images) and frame sampling (video)
# --------------------------------------------------------------------------

def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resample of image sample grids (vectorized
    NumPy per Arrow batch; a real pipeline swaps in PIL.resize)."""
    schema = StructType([
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("samples", ArrayType(FloatType())),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            refs, arrs = [], []
            for ref, w, h, c, samples in zip(b["media_ref"], b["width"],
                                             b["height"], b["channels"],
                                             b["samples"]):
                # (height, width, channels) row-major — the same layout
                # the PIL decode path ravels, so real images resize
                # with correct axes when the codec lights up
                a = np.asarray(samples, dtype=np.float32).reshape(
                    int(h), int(w), int(c))
                hi = (np.arange(out_h) * h // out_h).astype(np.int64)
                wi = (np.arange(out_w) * w // out_w).astype(np.int64)
                arrs.append(a[np.ix_(hi, wi)].ravel())
                refs.append(ref)
            yield pd.DataFrame({"media_ref": refs,
                                "width": out_w, "height": out_h,
                                "samples": arrs})

    imgs = decoded.where(F.col("modality") == "image")
    return imgs.mapInPandas(gen, schema)


def sample_frames(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Video -> one row per sampled frame (frame pixels sliced out).

    JVM-side: frame extraction is array slicing, so it compiles to
    built-in `slice`/`explode` — no Python in the hot path.
    """
    vids = decoded.where(F.col("modality") == "video")
    frame_px = F.col("width") * F.col("height")
    idx = F.explode(F.sequence(
        F.lit(0), F.col("channels") - 1, F.lit(every_n))).alias("frame_idx")
    v = vids.select("media_ref", "width", "height", "samples",
                    frame_px.alias("frame_px"), idx)
    return v.select(
        "media_ref", "frame_idx", "width", "height",
        F.slice("samples", F.col("frame_idx") * F.col("frame_px") + 1,
                F.col("frame_px")).alias("frame_samples"))
