"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators. The image/audio codecs are NOT in this
container, so the decode kernels are STUBS: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the content digest) produces stable
"pixel statistics" — the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and tested; only the codec is fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_ref string, media_type string, width int, height int, payload binary"

FEATURE_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "mean_luma double, feat array<float>"
)


def synthesize_media(df: DataFrame, media_ref_col: str = "media_ref") -> DataFrame:
    """Attach a deterministic fake binary payload + metadata to media refs
    (the carrier for tests; real pipelines read the bytes from object
    storage via a source connector)."""
    ref = F.col(media_ref_col)
    return df.select(
        ref.alias("media_ref"),
        F.element_at(F.split(ref, "/"), 3).alias("media_type"),
        (F.pmod(F.xxhash64(ref), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(ref, F.lit(1)), F.lit(512)) + 16).cast("int").alias("height"),
        F.to_binary(F.md5(ref), F.lit("hex")).alias("payload"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: digest-seeded pseudo-image."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(min(height, 32), min(width, 32)), dtype=np.uint8)


def extract_features(media: DataFrame, fake: bool = False, n_feat: int = 8) -> DataFrame:
    """decode → per-image stats + a small feature vector, Arrow-batched.

    Real decode is stubbed (no codec libs in this image): fake=False
    raises NotImplementedError at execution time — the guard documents the
    integration point; fake=True runs the deterministic fake decoder."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not fake:
                raise NotImplementedError(
                    "image/audio codecs not available in this environment; "
                    "pass fake=True for the deterministic stub decoder"
                )
            lumas, feats = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _fake_decode(bytes(payload), int(w), int(h))
                lumas.append(float(img.mean()))
                hist = np.histogram(img, bins=n_feat, range=(0, 256))[0]
                feats.append((hist / max(1, img.size)).astype(np.float32))
            out = pdf[["media_ref", "media_type", "width", "height"]].copy()
            out["mean_luma"] = lumas
            out["feat"] = feats
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands each media row into sampled
    frame indices (decode stubbed the same way). Pure JVM expansion."""
    n_frames = (F.pmod(F.xxhash64("media_ref", F.lit(2)), F.lit(300)) + 1).cast("int")
    return media.select(
        "media_ref",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
