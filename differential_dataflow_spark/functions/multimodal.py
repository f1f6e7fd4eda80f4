"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The decode step itself is STUBBED in this sandbox (no PIL/ffmpeg/torchcodec
in the image): ``decoder="fake"`` runs a deterministic stand-in so the whole
pipeline — schema, partition sizing, batch shapes, UDF signatures — is real
and tested; ``decoder="real"`` raises NotImplementedError at the exact point
a production build would call the codec.

Scale notes (how this runs on 100 TB of media):
- binary payloads stay in parquet/Iceberg with large row groups;
  ``spark.sql.files.maxPartitionBytes`` sizes partitions so one Arrow batch
  of decoded frames fits executor memory;
- metadata (width/height/duration/codec) lives in plain columns so filters
  prune *before* any decode (predicate pushdown on the scan);
- decode is mapInPandas (per-partition iterator) — no shuffle; downstream
  feature columns are ordinary vectors feeding similarity.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random bytes,
    metadata consistent with kind."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("media_id").cast("string")), 256)
    return base.select(
        "media_id",
        "kind",
        F.to_binary(payload, F.lit("hex")).alias("payload"),
        F.when(F.col("kind") == "image", "image/png")
        .when(F.col("kind") == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.when(F.col("kind") != "audio", (F.col("media_id") % 64 + 32).cast("int")).alias(
            "width"
        ),
        F.when(F.col("kind") != "audio", (F.col("media_id") % 48 + 24).cast("int")).alias(
            "height"
        ),
        F.when(F.col("kind") != "image", (F.col("media_id") * 100 % 60000).cast("int"))
        .alias("duration_ms"),
    )


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> fixed-dim float feature."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """media table -> (media_id, kind, feature array<float>) via mapInPandas.

    ``decoder="real"`` marks where PIL/librosa/ffmpeg decode would run.
    """

    out_schema = "media_id long, kind string, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this image; "
                    "swap _fake_decode for the codec call here"
                )
            feats = [
                _fake_decode(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, out_schema
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (explode of a sequence — pure Catalyst; the decode of each frame is the
    stubbed step above). Output: (media_id, frame_ts_ms)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )


def resize_metadata(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize bookkeeping (aspect-preserving target dims) — metadata-only,
    no decode; the actual pixel resize happens inside the decode kernel."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )
