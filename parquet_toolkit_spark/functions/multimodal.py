"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container image has no image/audio libraries, so the actual media
decode is STUBBED (raises NotImplementedError unless the deterministic
fake decoder is requested) — but the Spark-side plumbing is real and
tested: schema, Arrow batch shapes, mapInPandas partitioning, metadata
extraction, frame sampling layout.

Schema convention:
    media(media_id: long, kind: string, meta: string(json), payload: binary)
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "media_id LONG, kind STRING, meta STRING, payload BINARY"
FEATURE_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes LONG, sha256 STRING, "
    "feature ARRAY<FLOAT>"
)


def make_media_df(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata json)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image/png", "audio/wav", "video/mp4"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        meta = json.dumps({
            "width": int(rng.integers(16, 512)) if kind.startswith("image") else None,
            "duration_ms": int(rng.integers(100, 60000)) if not kind.startswith("image") else None,
            "codec": {"image/png": "png", "audio/wav": "pcm16", "video/mp4": "h264"}[kind],
        })
        rows.append((i, kind, meta, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def real_decode(payload: bytes, kind: str):
    """The real media decode would live here (PIL/librosa/av). Not
    available in this environment."""
    raise NotImplementedError(
        "media decoding libraries are not installed in this container; "
        "use fake=True for the deterministic plumbing-test decoder"
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: sha256-seeded pseudo-embedding.

    Keeps the full pipeline (batching, schema, downstream ANN) testable
    without media libs."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real Arrow batch flow: payloads arrive as one binary column per batch;
    per-batch numpy work; output is a typed feature array column ready for
    similarity.lsh_ann_topk."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parquet_toolkit_spark.runtime import tune_malloc

        tune_malloc()
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if not fake:
                    real_decode(raw, kind)  # raises: documented stub
                feats.append(_fake_feature(raw, dim))
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": sizes,
                "sha256": shas,
                "feature": [f.tolist() for f in feats],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling layout for video rows: one output row per sampled
    frame timestamp (decode stubbed; timestamps from metadata duration)."""
    from pyspark.sql import functions as F

    dur = F.get_json_object("meta", "$.duration_ms").cast("long")
    frames = F.sequence(
        F.lit(0), F.coalesce(dur, F.lit(0)), F.lit(int(every_ms))
    )
    return (
        df.where(F.col("kind").startswith("video"))
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
