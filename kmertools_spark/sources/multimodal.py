"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas kernels. The decode step uses Pillow when it is installed
and the payload is a real encoded image (magic-sniffed); otherwise — as
in this container, which ships no codecs — a deterministic fallback
tiles the payload bytes to the metadata dims, so the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested end-to-end in both modes. Audio/video codecs (ffmpeg et al.)
remain an integration point at the same seam.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("mime", StringType()),
                ]
            ),
        ),
    ]
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 4 * 16, 48 + i % 3 * 16, 1 + (i % 7), f"x-fake/{kind}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


try:  # optional real codec — absent in this container, used when present
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False

# magic prefixes of the formats Pillow decodes for us; BMP's 2-byte
# 'BM' can false-positive on random payloads, but the try/except below
# routes those to the deterministic fallback, so real BMPs still decode
_IMAGE_MAGIC = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF87a", b"GIF89a", b"BM")


def _decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a payload to (h, w, 3) uint8 RGB.

    When Pillow is installed AND the payload starts with a real image
    magic (PNG/JPEG/GIF/BMP), the actual codec runs and the true pixel
    dims win over the metadata hint; a corrupt/truncated payload falls back
    instead of failing the task (one bad blob must not kill a 100 TB
    job). Otherwise — this container has no codecs — the deterministic
    fallback tiles the payload bytes to (height, width, 3) so every
    downstream kernel (features, resize, frame plumbing) exercises real
    shapes and real batches either way.
    """
    if _HAS_PIL and payload.startswith(_IMAGE_MAGIC):
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)
        except Exception:
            pass  # corrupt header: deterministic fallback below
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    tiled = np.resize(raw, need)
    return tiled.reshape(height, width, 3)


def _safe_decode(p, m) -> np.ndarray:
    """NULL-tolerant decode: a row with NULL payload/meta (or
    non-positive dims) yields a deterministic 1x1 black placeholder
    instead of a TypeError that kills the whole job — the module's
    one-bad-blob contract covered only the corrupt-codec path before
    (code-review r5)."""
    w = int(m["width"]) if m is not None and m["width"] else 0
    h = int(m["height"]) if m is not None and m["height"] else 0
    if p is None or w < 1 or h < 1:
        return np.zeros((1, 1, 3), dtype=np.uint8)
    return _decode_rgb(bytes(p), w, h)


def media_features(df: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-media feature vector: channel-mean + byte histogram.

    mapInPandas over (media_id, payload, meta) — Arrow batches, numpy
    kernels, no per-row Python beyond the stubbed decode loop (bounded
    by batch size; a real codec call is per-payload by nature).
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("feat", ArrayType(DoubleType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                continue
            metas = pdf["meta"]
            # REAL-CODEC INTEGRATION POINT: this comprehension is the one
            # per-payload step (a codec call is per-payload by nature —
            # swap _decode_rgb for Pillow/libjpeg/ffmpeg on a cluster
            # that has them). Everything below is one vectorized pass
            # over the concatenated pixels of the whole Arrow batch.
            imgs = [
                _safe_decode(p, m) for p, m in zip(pdf["payload"], metas)
            ]
            sizes = np.fromiter((im.size for im in imgs), dtype=np.int64, count=k)
            flat = np.concatenate([im.ravel() for im in imgs])
            rows = np.repeat(np.arange(k), sizes)
            # uniform byte-value bins for ANY n_bins (for n_bins=8 this
            # equals the classic >>5); computed in int64 so the row
            # offset math can never spill into a neighbor's histogram
            bins = (flat.astype(np.int64) * n_bins) >> 8
            hist = (
                np.bincount(rows * n_bins + bins, minlength=k * n_bins)
                .reshape(k, n_bins)
                .astype(np.float64)
            )
            hist /= np.maximum(1.0, hist.sum(axis=1))[:, None]
            offs = np.zeros(k, dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            ch = (np.arange(flat.size, dtype=np.int64) - offs[rows]) % 3
            csum = np.bincount(
                rows * 3 + ch, weights=flat, minlength=k * 3
            ).reshape(k, 3)
            means = csum / np.maximum(1, sizes[:, None] // 3) / 255.0
            feats = np.concatenate([means, hist], axis=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "feat": list(feats),
                }
            )

    # select() before the Python boundary (CLAUDE.md invariant): a
    # caller's widened frame must not ship extra columns through Arrow
    return df.select("media_id", "kind", "payload", "meta").mapInPandas(gen, schema)


def media_resize(df: DataFrame, out_w: int = 32, out_h: int = 24) -> DataFrame:
    """Resize images to (out_w, out_h): one row per media with the
    resized raw RGB payload + updated meta.

    Decode is the stubbed per-payload step (real-codec integration
    point, as in media_features); the resample itself is nearest-
    neighbor via pure numpy index gather — per batch, one gather per
    image (vectorizable further with a real codec's SIMD path). Output
    payload is raw interleaved RGB bytes (out_h x out_w x 3), the shape
    a downstream feature extractor or encoder consumes.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                continue
            out_payload = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                img = _safe_decode(p, m)
                ys = (np.arange(out_h) * img.shape[0] // out_h).astype(np.int64)
                xs = (np.arange(out_w) * img.shape[1] // out_w).astype(np.int64)
                out_payload.append(img[ys[:, None], xs[None, :]].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "payload": out_payload,
                    "width": np.full(k, out_w, dtype=np.int32),
                    "height": np.full(k, out_h, dtype=np.int32),
                }
            )

    return df.select("media_id", "kind", "payload", "meta").mapInPandas(gen, schema)


def frame_sample(df: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index.

    Pure JVM expressions (sequence + explode); the per-frame decode
    would plug into media_features downstream.
    """
    # n_frames <= 0 (or NULL) must emit zero frames, not throw: with a
    # positive step, sequence(0, -1, every) raises Illegal sequence
    # boundaries and kills the job on one corrupt clip (code-review r5)
    return (
        df.where(
            (F.col("kind") == "video")
            & (F.coalesce(F.col("meta.n_frames"), F.lit(0)) > 0)
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )


def audio_features(df: DataFrame, n_windows: int = 8) -> DataFrame:
    """Per-clip audio features: duration, zero-crossing rate, and an
    RMS loudness envelope over ``n_windows`` equal windows.

    REAL-CODEC INTEGRATION POINT (same seam as _decode_rgb): the
    payload -> waveform step interprets the payload as raw
    little-endian int16 PCM — deterministic and container-safe; swap in
    soundfile/ffmpeg on a cluster that ships them and everything below
    is unchanged. After the per-payload decode, the whole Arrow batch
    is ONE concatenated numpy pass: per-(clip, window) sums via
    bincount on fused indices, zero crossings via a sign-change diff
    masked at clip boundaries — no per-row Python beyond the decode
    loop.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("zcr", DoubleType()),
            StructField("rms", ArrayType(DoubleType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                continue
            waves = []
            for p in pdf["payload"]:
                b = b"" if p is None else bytes(p)  # NULL clip -> empty wave
                waves.append(
                    np.frombuffer(b[: len(b) & ~1], dtype="<i2").astype(
                        np.float64
                    )
                    / 32768.0
                )
            sizes = np.fromiter((w.size for w in waves), dtype=np.int64, count=k)
            flat_len = int(sizes.sum())
            flat = np.concatenate(waves) if flat_len else np.zeros(0)
            rows = np.repeat(np.arange(k), sizes)
            offs = np.zeros(k, dtype=np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            pos = np.arange(flat_len, dtype=np.int64) - offs[rows]
            win = pos * n_windows // np.maximum(1, sizes[rows])
            idx = rows * n_windows + win
            sq = np.bincount(idx, weights=flat * flat, minlength=k * n_windows)
            cnt = np.bincount(idx, minlength=k * n_windows)
            rms = np.sqrt(sq / np.maximum(1, cnt)).reshape(k, n_windows)
            # zero crossings: sign changes between in-clip neighbors only
            if flat_len > 1:
                sign = flat >= 0
                change = sign[1:] != sign[:-1]
                same_row = rows[1:] == rows[:-1]
                zc = np.bincount(
                    rows[1:], weights=(change & same_row), minlength=k
                )
            else:
                zc = np.zeros(k)
            zcr = zc / np.maximum(1, sizes - 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_samples": sizes,
                    "zcr": zcr,
                    "rms": list(rms),
                }
            )

    return (
        df.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(gen, schema)
    )
