"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; all the
Spark-side machinery (schemas, type sniffing, Arrow batch shapes, partition
strategy) is real and tested. The actual codec step is STUBBED: the
image/audio libraries are not in this container, so ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic hash-derived byte grid (clearly marked; lets the downstream
feature/resize plumbing be exercised end to end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("width", IntegerType()),         # typed metadata
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
])

_MAGIC = {
    "png": bytes([0x89, 0x50, 0x4E, 0x47]),
    "jpeg": bytes([0xFF, 0xD8, 0xFF]),
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi container
}


def sniff_media_type(payload: Column) -> Column:
    """Magic-byte container sniff — pure JVM substring compares on the
    binary column (no decode, no Python)."""
    head = F.substring(payload, 1, 4)
    out = F.lit("unknown")
    for name, magic in reversed(_MAGIC.items()):
        out = F.when(F.substring(payload, 1, len(magic)) == F.lit(magic), name).otherwise(out)
    return out



def _fake_pixels(seed_bytes: bytes, th: int, tw: int) -> np.ndarray:
    """THE deterministic stub decode: sha256 stream expanded to a th x tw
    uint8 grid — single definition shared by every fake codec path."""
    digest = hashlib.sha256(seed_bytes).digest()
    reps = (th * tw) // len(digest) + 1
    return np.frombuffer((digest * reps)[: th * tw], dtype=np.uint8)


_DECODE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("mean_intensity", DoubleType()),
    StructField("histogram", ArrayType(LongType())),
])


def decode_and_featurize(
    media: DataFrame, target: tuple[int, int] = (16, 16), fake: bool = False,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Decode -> resize -> feature-extract via ``mapInPandas`` (Arrow
    batches; one decode call per row inside a vectorized batch loop).

    ``carry`` names extra input columns to pass through unchanged, so
    downstream consumers get metadata + features in ONE pass instead of
    re-executing the Python subtree through a self-join.

    STUB: real codecs are unavailable in this environment. With
    ``fake=True`` the decode is a deterministic sha256-derived byte grid so
    batch shapes, schema, and downstream features are real and testable.
    """
    th, tw = target
    in_fields = {f.name: f for f in media.schema.fields}
    out_schema = StructType(
        list(_DECODE_SCHEMA.fields) + [in_fields[c] for c in carry]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "height": [], "width": [], "mean_intensity": [], "histogram": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "image/audio codecs are not available in this build; "
                        "pass fake=True for the deterministic stub decode"
                    )
                # FAKE DECODE (deterministic): sha256 stream -> byte grid
                pixels = _fake_pixels(bytes(payload), th, tw).reshape(th, tw)
                out["media_id"].append(int(mid))
                out["height"].append(th)
                out["width"].append(tw)
                out["mean_intensity"].append(float(pixels.mean()))
                out["histogram"].append(np.bincount(pixels.ravel() >> 6, minlength=4).tolist())
            res = pd.DataFrame(out)
            for c in carry:
                res[c] = pdf[c].reset_index(drop=True)
            yield res

    return media.mapInPandas(run, schema=out_schema)


_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("mean_intensity", DoubleType()),
])


def sample_frames(
    media: DataFrame, n_frames: int = 30, stride: int = 10,
    target: tuple[int, int] = (8, 8), fake: bool = False,
) -> DataFrame:
    """Frame sampling for video payloads: every ``stride``-th frame of the
    first ``n_frames`` is decoded and featurized via ``mapInPandas`` —
    one output row per (media, sampled frame).

    STUB: video codecs are unavailable in this container; with ``fake=True``
    frame t decodes to a deterministic sha256(payload || t) byte grid so the
    row-explosion shape, Arrow batching and downstream schema are real. A
    real deployment swaps the two marked lines for a demuxer call.
    """
    th, tw = target
    idxs = list(range(0, n_frames, max(stride, 1)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "mean_intensity": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for t in idxs:
                    if not fake:
                        raise NotImplementedError(
                            "video codecs are not available in this build; "
                            "pass fake=True for the deterministic stub decode"
                        )
                    # FAKE FRAME DECODE (deterministic): sha256(payload||t)
                    pixels = _fake_pixels(bytes(payload) + t.to_bytes(4, "big"), th, tw)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(t)
                    out["mean_intensity"].append(float(pixels.mean()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=_FRAME_SCHEMA)


def synth_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table: payload bytes derived from the id, with a
    mix of sniffable magic headers."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)
    df = spark.range(0, n, 1, partitions)
    magic = (
        F.when(F.col("id") % 4 == 0, F.lit(_MAGIC["png"]))
        .when(F.col("id") % 4 == 1, F.lit(_MAGIC["jpeg"]))
        .when(F.col("id") % 4 == 2, F.lit(_MAGIC["gif"]))
        .otherwise(F.lit(_MAGIC["riff"]))
    )
    body = F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "UTF-8")
    return df.select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 4 == 3, "audio").otherwise("image").alias("kind"),
        F.concat(magic, body).alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.when(F.col("id") % 4 == 3, 16000).alias("sample_rate"),
    )
