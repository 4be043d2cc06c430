"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `meta` map. Decode /
feature-extract / resize / frame-sample run as Arrow-batched functions over
`mapInPandas` so payload bytes never round-trip through per-row Python.

The actual codec libraries (Pillow, ffmpeg, librosa) are NOT present in this
environment, so the decode step is STUBBED: `decode_media(..., use_real=True)`
raises NotImplementedError, while the default deterministic fake derives
features from the payload bytes (stable across runs/cluster sizes) so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is real
and fully tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: seed numpy from the payload
    digest. Stable for identical bytes on any executor."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    return np.random.RandomState(seed).standard_normal(dim).astype(np.float32)


#: per-kind real decoders, registered when codec libraries exist on the
#: cluster (register_decoder("image", pil_decode), ...). Each maps
#: (payload: bytes, dim: int) -> np.ndarray of length dim. The ONLY stubbed
#: surface is the codec call itself — dispatch, batching, schema and
#: partitioning are real and tested (mock decoders injected in tests).
_REAL_DECODERS: dict = {}


def register_decoder(kind: str, fn) -> None:
    _REAL_DECODERS[kind] = fn


def decode_media(
    payload: bytes, kind: str, use_real: bool = False, dim: int = 64, decoder=None
) -> np.ndarray:
    if use_real:
        fn = decoder or _REAL_DECODERS.get(kind)
        if fn is None:
            # The real decoders (PIL/ffmpeg/soundfile) are not available in
            # this container. register_decoder() plugs them in on a cluster.
            raise NotImplementedError(f"no registered decoder for {kind!r}")
        return np.asarray(fn(payload, dim), dtype=np.float32)
    return _fake_features(payload, dim)


def extract_features(
    df: DataFrame, dim: int = 64, use_real: bool = False, decoder=None
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out; payload
    bytes stay in Arrow buffers end to end. With use_real=True, dispatches to
    the per-kind registered decoders (or the injected `decoder`) — the same
    batched plumbing either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(
                    p if p is not None else b"", k, use_real=use_real, dim=dim, decoder=decoder
                )
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, frame_size: int = 1024, every_n: int = 2) -> DataFrame:
    """Video frame sampling (stub): treat the payload as fixed-size frames and
    keep every n-th — the real implementation swaps the chunker for an ffmpeg
    keyframe iterator; the fan-out shape (1 row -> k rows) is what matters."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_bytes = [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                frames = [
                    payload[i : i + frame_size]
                    for i in range(0, len(payload), frame_size)
                ]
                for idx in range(0, len(frames), every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_bytes.append(frames[idx])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def media_from_documents(docs: DataFrame, limit: int | None = None) -> DataFrame:
    """Deterministic media table derived from the documents table: the text
    payload is treated as the opaque binary blob (UTF-8 bytes), kind cycles by
    doc_id. Fully distributed (a projection, no driver data), and every output
    column is predictable from the source table — which is what lets the
    multimodal feature path have an exact ANSI-SQL oracle twin: n_bytes is
    computed from the REAL payload bytes inside the Arrow batch, the oracle
    recomputes it as octet_length(encode(text))."""
    out = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("codec"), F.lit("fake")).alias("meta"),
    )
    if limit is not None:
        out = out.filter(F.col("media_id") < limit)
    return out


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    rows = []
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(512 + (i % 5) * 700)
        rows.append((i, kind, bytearray(payload), {"codec": "fake", "idx": str(i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
