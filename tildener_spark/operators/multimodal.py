"""Multimodal (image/audio/video) column plumbing.

Training-data pipelines carry media as opaque ``binary`` columns with
typed metadata; the Spark-side contract — schema, partitioning, Arrow
batch shape, UDF signatures — is real and tested here, while the
actual codec work is stubbed (no image/audio libraries in this
container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless a library import succeeds, and
``fake_decode=True`` substitutes a deterministic fake whose outputs
are pure functions of the payload bytes (so tests are stable).

At 100 TB the rules encoded here are the load-bearing part:
  * media stays ``binary`` end to end; nothing ever collects to the
    driver;
  * feature extraction is ``mapInPandas`` so one Arrow batch holds
    many blobs and a model/codec loads once per worker, not per row;
  * outputs are fixed-width feature arrays + scalar metadata, never
    re-encoded payloads (write amplification).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("media_type", T.StringType()),  # image|audio|video
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 16


def _try_import_codecs():
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode path; requires an imaging library."""
    if not _try_import_codecs():
        raise NotImplementedError(
            "image decoding requires PIL/opencv (absent in this env); "
            "use fake_decode=True for plumbing tests")
    raise NotImplementedError("wire to PIL.Image.open when available")


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in: 16 floats from the sha256 digest."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float32) / 65535.0).tolist()


def extract_media_features(media: DataFrame,
                           fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for p in payloads:
                raw = bytes(p) if p is not None else b""
                if not fake_decode:
                    decode_image(raw)  # raises NotImplementedError
                feats.append(_fake_features(raw))
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(
                    lambda p: len(p) if p is not None else 0),
                "sha256": payloads.map(
                    lambda p: hashlib.sha256(
                        bytes(p) if p is not None else b"").hexdigest()),
                "features": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark: SparkSession, n: int = 64,
                    seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}|{i}".encode()).digest() * (
            (i % 7) + 1)
        mt = ["image", "audio", "video"][i % 3]
        rows.append((
            i, mt, bytearray(payload),
            64 + i % 512 if mt == "image" else None,
            64 + (i * 3) % 512 if mt == "image" else None,
            1000 + i * 37 if mt != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("orig_width", T.IntegerType()),
    T.StructField("orig_height", T.IntegerType()),
    T.StructField("new_width", T.IntegerType()),
    T.StructField("new_height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(media: DataFrame, max_side: int = 256,
                  fake_decode: bool = True) -> DataFrame:
    """mapInPandas image resize plumbing.

    Geometry (aspect-preserving clamp of the longer side to
    ``max_side``) is computed for real from the metadata columns; the
    pixel work is the stubbed decode (``fake_decode=True`` emits a
    deterministic payload: sha256 of the input keyed by the target
    geometry, so tests are stable and re-runs idempotent).  The batch
    shape — one Arrow batch of many blobs per invocation, codec state
    loadable once per worker — is the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "orig_width",
                                   "orig_height", "new_width",
                                   "new_height", "payload")}
            for _, row in pdf.iterrows():
                w = int(row["width"] or 0)
                h = int(row["height"] or 0)
                if max(w, h) > max_side and max(w, h) > 0:
                    scale = max_side / max(w, h)
                    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                else:
                    nw, nh = w, h
                raw = bytes(row["payload"] or b"")
                if not fake_decode:
                    decode_image(raw)  # raises NotImplementedError
                fake = hashlib.sha256(
                    raw + f"|{nw}x{nh}".encode()).digest()
                out["asset_id"].append(row["asset_id"])
                out["orig_width"].append(w)
                out["orig_height"].append(h)
                out["new_width"].append(nw)
                out["new_height"].append(nh)
                out["payload"].append(fake)
            yield pd.DataFrame(out)

    return media.filter(media.media_type == "image") \
        .mapInPandas(run, schema=RESIZE_SCHEMA)


def audio_windows_plan(media: DataFrame, window_ms: int = 2000,
                       hop_ms: int = 1000) -> DataFrame:
    """Audio windowing *plan*: one row per (asset, window start/end).

    Same contract as frame_sample_plan — the explode shape is real
    Spark (sequence + explode, whole-stage codegen); the per-window
    sample decode is the stubbed part."""
    from pyspark.sql import functions as F
    return (
        media.filter(F.col("media_type") == "audio")
        .withColumn(
            "win_start",
            F.explode(F.sequence(
                F.lit(0),
                F.greatest(F.lit(0), F.col("duration_ms") - window_ms),
                F.lit(hop_ms))))
        .select(
            "asset_id", "win_start",
            (F.col("win_start") + window_ms).alias("win_end"))
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts).

    The decode is stubbed; the explode shape (posexplode over a
    sequence column) is the real Spark-side contract."""
    from pyspark.sql import functions as F
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ts",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"),
                           F.lit(every_ms))),
        )
        .select("asset_id", "frame_ts")
    )
