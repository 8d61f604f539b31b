"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample run
as Arrow-vectorized passes over ``mapInArrow``.  The actual codec step is
STUBBED (no image/audio libraries in this container): ``decode_fn=None``
uses a deterministic fake decoder so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and tested; swap in a
real decoder (PIL/ffmpeg) via ``decode_fn`` in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, digest string, feature array<float>"


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded feature
    vector.  Replace with a real decode+embed in production —
    NotImplementedError is NOT raised so pipelines are runnable
    end-to-end in environments without codec libraries."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_media_features(
    media: DataFrame,
    dim: int = 16,
    decode_fn: Callable[[bytes, int], "np.ndarray"] | None = None,
) -> DataFrame:
    """media(…payload binary…) → per-item feature rows (one Arrow pass).

    The batch shape is the contract: payloads stay in Arrow buffers until
    the decode loop; output features are a fixed-width ``array<float>``
    ready for :mod:`linkgraph.textops.ann`.
    """
    fake = _fake_decode

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        decode = decode_fn or fake
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            kinds = batch.column("kind").to_pylist()
            payloads = batch.column("payload").to_pylist()
            n_bytes = [len(p or b"") for p in payloads]
            digests = [hashlib.md5(p or b"").hexdigest() for p in payloads]
            # NULL payloads reach decode as b"" like the adjacent
            # n_bytes/digest normalization — a real decoder's
            # Callable[[bytes, int], ndarray] contract never sees None
            feats = [decode(p or b"", dim).tolist() for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(kinds, type=pa.string()),
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(digests, type=pa.string()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "digest", "feature"],
            )

    return media.mapInArrow(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plan: ``(media_id, frame_index)`` rows.

    Pure plan-side: which frames WOULD be decoded (the decode itself is
    the stubbed step).  ``sequence`` + ``explode`` keeps it JVM-side.
    """
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.lit((max_frames - 1) * every_n),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )
