"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `meta` map. Decode /
feature-extract / resize / frame-sample run as Arrow-batched functions over
`mapInPandas` so payload bytes never round-trip through per-row Python.

Decode comes in three tiers:
  * REAL, lib-free: WAV (RIFF chunk walk + PCM), PPM (P6) and BMP (24-bpp)
    are parsed in pure numpy — `use_real=True` is a genuinely exercised path
    for audio/image, oracle-gated end to end (multimodal_decode_real).
  * REAL, pluggable: kinds needing codec libraries (video; jpeg/mp3/...)
    dispatch through `register_decoder` — Pillow/ffmpeg plug in on a cluster;
    in this container an unregistered kind raises NotImplementedError.
  * FAKE: the default deterministic stand-in derives features from the payload
    digest (stable across runs/cluster sizes) for plumbing tests and benches.
"""

from __future__ import annotations

import hashlib
import struct
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


# ------------------------------------------------------------- real codecs
# Pure-numpy encoders/parsers for the container formats that need NO external
# libraries. These make `use_real=True` a real, tested path (the reference has
# no multimodal surface; this is the training-data-pipeline extension).


def wav_bytes(pcm, sample_rate: int = 16000, channels: int = 1, bits: int = 8) -> bytes:
    """Minimal spec-valid RIFF/WAVE PCM writer. `pcm` is raw sample bytes
    (uint8 for bits=8, little-endian int16 for bits=16)."""
    block_align = channels * bits // 8
    data = bytes(pcm)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8 + len(data)) + b"WAVE"
        + fmt + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM parser: walks the chunk list (no fixed 44-byte layout
    assumption; skips LIST/fact/etc., honors word alignment). Returns header
    fields plus the decoded sample array (uint8 or int16, (n, channels) when
    multichannel)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype=np.uint8 if bits == 8 else np.dtype("<i2"))
    if channels > 1:
        samples = samples[: samples.size // channels * channels].reshape(-1, channels)
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_samples": int(samples.shape[0]),
        "samples": samples,
    }


def ppm_bytes(gray: bytes, maxval: int = 255) -> bytes:
    """P6 PPM writer: a single row of RGB pixels with R=G=B=gray byte."""
    rgb = np.repeat(np.frombuffer(bytes(gray), dtype=np.uint8), 3).tobytes()
    return f"P6\n{len(gray)} 1\n{maxval}\n".encode() + rgb


def decode_ppm(payload: bytes) -> dict:
    """P6 PPM parser: whitespace/comment-tolerant header scan + raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval per spec
    w, h, maxval = fields
    px = np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
    return {"width": w, "height": h, "maxval": maxval, "pixels": px.reshape(h, w, 3)}


def bmp_bytes(gray: bytes) -> bytes:
    """Minimal 24-bpp uncompressed BMP writer: one bottom-up row, rows padded
    to 4 bytes per spec (BGR order on disk)."""
    row = np.repeat(np.frombuffer(bytes(gray), dtype=np.uint8), 3).tobytes()
    body = row + b"\x00" * ((-len(row)) % 4)
    info = struct.pack("<IiiHHIIiiII", 40, len(gray), 1, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54) + info + body


def decode_bmp(payload: bytes) -> dict:
    """24-bpp uncompressed BMP parser: honors pixel-array offset, per-row
    4-byte padding, bottom-up vs top-down (negative height), BGR→RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    _hsize, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", payload[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bpp uncompressed BMP supported (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        row = np.frombuffer(payload[offset + r * stride : offset + r * stride + w * 3], np.uint8)
        px[r] = row.reshape(w, 3)
    if flip:
        px = px[::-1]
    return {"width": w, "height": h, "pixels": px[:, :, ::-1]}  # BGR -> RGB


def _audio_features_real(payload: bytes, dim: int) -> np.ndarray:
    """Real audio features from a WAV payload: [sample_rate, channels, bits,
    n_samples, duration_ms] + per-chunk RMS energy filling the remaining dims."""
    wav = decode_wav(payload)
    s = wav["samples"].astype(np.float64)
    if s.ndim > 1:
        s = s.mean(axis=1)
    head = [
        float(wav["sample_rate"]),
        float(wav["channels"]),
        float(wav["bits"]),
        float(wav["n_samples"]),
        wav["n_samples"] * 1000.0 / wav["sample_rate"],
    ]
    k = max(dim - len(head), 0)
    tail = [
        float(np.sqrt(np.mean(c * c))) if c.size else 0.0
        for c in (np.array_split(s, k) if k and s.size else [])
    ]
    tail += [0.0] * (k - len(tail))
    return np.asarray((head + tail)[:dim], dtype=np.float32)


def _image_features_real(payload: bytes, dim: int) -> np.ndarray:
    """Real image features from a PPM or BMP payload (sniffed by magic):
    [width, height, mean R, mean G, mean B] + grayscale block means."""
    if payload[:2] == b"P6":
        img = decode_ppm(payload)
    elif payload[:2] == b"BM":
        img = decode_bmp(payload)
    else:
        raise ValueError("unsupported image container (PPM/BMP only without codec libs)")
    flat = img["pixels"].reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0) if flat.size else np.zeros(3)
    head = [float(img["width"]), float(img["height"]), means[0], means[1], means[2]]
    k = max(dim - len(head), 0)
    gray = flat.mean(axis=1) if flat.size else np.zeros(0)
    tail = [
        float(c.mean()) if c.size else 0.0
        for c in (np.array_split(gray, k) if k and gray.size else [])
    ]
    tail += [0.0] * (k - len(tail))
    return np.asarray((head + tail)[:dim], dtype=np.float32)


#: kinds decodable with zero external libraries — the built-in real path.
_BUILTIN_REAL_DECODERS = {"audio": _audio_features_real, "image": _image_features_real}


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
        fn = decoder or _REAL_DECODERS.get(kind) or _BUILTIN_REAL_DECODERS.get(kind)
        if fn is None:
            # Kinds needing real codec libraries (video: ffmpeg) are not
            # decodable in this container. register_decoder() plugs them in
            # on a cluster; audio/image fall back to the built-in pure-numpy
            # WAV/PPM/BMP parsers above.
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


REAL_SUMMARY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_units", IntegerType(), False),  # samples (wav) / pixels (ppm)
        StructField("rate", IntegerType(), False),  # sample_rate (wav) / maxval (ppm)
        StructField("duration_ms", IntegerType(), False),  # floor ms (wav) / height (ppm)
        StructField("content_md5", StringType(), False),  # md5 of DECODED content
    ]
)

_REAL_WAV_RATE = 16000


def real_media_from_documents(docs: DataFrame, limit: int | None = None) -> DataFrame:
    """Media table with REAL containers built from the documents table: even
    doc_ids become spec-valid 8-bit PCM WAV files whose samples ARE the UTF-8
    text bytes; odd doc_ids become P6 PPM images whose R=G=B pixel bytes are
    the text bytes. Any standard reader decodes these payloads; deriving them
    from `documents` is what makes an exact ANSI-SQL oracle possible
    (n_samples/n_pixels = octet_length(text), md5 of decoded content =
    md5(text)). Fully distributed — the encoders run inside mapInPandas."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                if did % 2 == 0:
                    kinds.append("audio")
                    payloads.append(wav_bytes(data, sample_rate=_REAL_WAV_RATE))
                    metas.append({"container": "wav", "codec": "pcm_u8"})
                else:
                    kinds.append("image")
                    payloads.append(ppm_bytes(data))
                    metas.append({"container": "ppm", "codec": "raw"})
                ids.append(did)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def decode_real_summary(media: DataFrame) -> DataFrame:
    """REAL-decode summary — the oracle-gated proof that `use_real` decoding
    round-trips: each payload goes through the pure-numpy WAV/PPM parsers,
    then the DECODED samples/pixels are re-serialized and md5'd. The digest
    equals md5 of the source text bytes only if chunk walking, header parsing
    and sample/channel extraction are all correct."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in REAL_SUMMARY_SCHEMA.fields}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload or b"")
                if kind == "audio":
                    wav = decode_wav(payload)
                    content = wav["samples"].tobytes()
                    rows["n_units"].append(wav["n_samples"])
                    rows["rate"].append(int(wav["sample_rate"]))
                    rows["duration_ms"].append(
                        wav["n_samples"] * 1000 // wav["sample_rate"]
                    )
                else:
                    img = decode_ppm(payload)
                    content = img["pixels"][:, :, 0].tobytes()  # R channel
                    rows["n_units"].append(img["width"] * img["height"])
                    rows["rate"].append(int(img["maxval"]))
                    rows["duration_ms"].append(int(img["height"]))
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["content_md5"].append(hashlib.md5(content).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, REAL_SUMMARY_SCHEMA)


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
