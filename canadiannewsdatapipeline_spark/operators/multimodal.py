"""Multimodal column plumbing (BASELINE.json extensions).

Images/audio/video are opaque ``binary`` columns plus typed metadata;
the Spark-side machinery — schema, partition-sized Arrow batches,
mapInPandas signature — is real and tested. The actual media decode
is pluggable: this container has no image/audio libs, so the real
decoder raises NotImplementedError and tests use the deterministic
fake (SURVEY-mandated stub pattern).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, n_bytes int, width int, height int, channels int, feat_mean double"
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a multimodal table: payload bytes + typed metadata.

    In production the payload column comes straight from parquet/Delta
    (images stored inline or as object-store pointers); everything
    downstream only sees ``binary`` + metadata, so this stand-in
    exercises the identical plumbing."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.length(F.col(text_col).cast("binary")).alias("n_bytes"),
        (F.length(text_col) % 640).cast("int").alias("width"),
        (F.length(text_col) % 480).cast("int").alias("height"),
        F.lit(3).alias("channels"),
    )


def real_decode(payload: bytes) -> dict:
    """Decode real media bytes — requires PIL/cv2/librosa, absent here."""
    raise NotImplementedError(
        "media decode needs an image/audio library not present in this "
        "container; inject fake_decode or a real decoder via decode_features(decoder=...)"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: pseudo-features from a sha256
    of the payload, so tests are stable and engine-independent."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": int.from_bytes(h[0:2], "big") % 640,
        "height": int.from_bytes(h[2:4], "big") % 480,
        "channels": 3,
        "feat_mean": int.from_bytes(h[4:8], "big") / 2**32,
    }


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    decoder: Callable[[bytes], dict] = fake_decode,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches — the shape a
    real image/audio featurizer uses (per-partition batch iterator, no
    per-row Python overhead beyond the decode call itself)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "feat_mean": [f["feat_mean"] for f in feats],
                }
            )

    return df.select(F.col(id_col).alias(id_col), payload_col).mapInPandas(
        extract, FEATURE_SCHEMA
    )


FRAME_SCHEMA = "id long, frame_idx int, frame_bytes int, frame_md5 string"


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    frame_size: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Fixed-size frame sampling over binary payloads — the
    audio-window / video-frame-extraction shape: slice each payload
    into ``frame_size``-byte frames and emit every ``stride``-th one
    with its checksum.

    mapInPandas keeps the slicing in Arrow batches (one Python call
    per partition batch, not per row); the fan-out is bounded by
    payload_size/frame_size/stride rows per input row, all computed
    where the payload already lives — no shuffle at all."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for id_, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                for i in range(0, -(-len(p) // frame_size), stride):
                    fr = p[i * frame_size : (i + 1) * frame_size]
                    ids.append(id_)
                    idxs.append(i)
                    lens.append(len(fr))
                    md5s.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame_bytes": lens, "frame_md5": md5s}
            )

    return df.select(F.col(id_col).alias(id_col), payload_col).mapInPandas(
        frames, FRAME_SCHEMA
    )
