"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `meta` map. Decode /
feature-extract / resize / frame-sample run as Arrow-batched functions over
`mapInPandas` so payload bytes never round-trip through per-row Python.

Decode comes in three tiers:
  * REAL, lib-free: WAV (RIFF chunk walk + PCM + G.711), PPM (P6), BMP
    (24-bpp), PNG (zlib + all five predictors + Adam7), the full DCT JPEG
    family (baseline SOF0 incl. YCbCr subsampling and restart intervals;
    progressive SOF2), animated GIF (LZW), and the MP4/ISO-BMFF container
    (box walk + sample tables + per-sample byte extraction — frame
    SELECTION without a codec) are parsed in pure numpy/stdlib —
    `use_real=True` is a genuinely exercised path, oracle-gated end to end.
  * REAL, pluggable: compressed-video/audio BITSTREAMS inside containers
    (H.26x, AAC, mp3) dispatch through `register_decoder` — Pillow/ffmpeg
    plug in on a cluster; an unregistered kind raises NotImplementedError.
  * FAKE: the default deterministic stand-in derives features from the payload
    digest (stable across runs/cluster sizes) for plumbing tests and benches.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """Expansion tables computed from the G.711 segment layout (no hardcoded
    blobs): code -> linear int16 for mu-law (mu=255, bias 0x84, 8 segments)
    and A-law (A=87.6, even-bit inversion 0x55, 13-bit magnitude)."""
    codes = np.arange(256, dtype=np.int32)
    # --- mu-law: invert, split sign/segment/mantissa, undo the 0x84 bias
    u = ~codes & 0xFF
    sign = u & 0x80
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << seg) - 0x84
    ulaw = np.where(sign != 0, -mag, mag).astype(np.int16)
    # --- A-law: even bits inverted on the wire; segment 0 is linear; the
    # sign convention is OPPOSITE to mu-law's (CCITT reference alaw2linear:
    # sign bit SET means positive)
    a = codes ^ 0x55
    sign = a & 0x80
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (seg - 1))
    alaw = np.where(sign != 0, mag, -mag).astype(np.int16)
    return ulaw, alaw


_ULAW_EXPAND, _ALAW_EXPAND = _g711_tables()


def g711_expand(codes: bytes, law: str) -> np.ndarray:
    """G.711 decompressor: 8-bit companded codes -> linear int16 samples."""
    table = _ULAW_EXPAND if law == "ulaw" else _ALAW_EXPAND
    return table[np.frombuffer(bytes(codes), dtype=np.uint8)]


def g711_compress(pcm: np.ndarray, law: str) -> bytes:
    """G.711 compressor (segment search over the expansion table's decision
    boundaries). Exact inverse of g711_expand on its own output: the
    code -> linear -> code round-trip is the identity for all 256 A-law
    codes (the A-law table is injective, min magnitude 8), and for all
    mu-law codes except the +0/-0 pair (0x7F and 0xFF both expand to 0 —
    inherent to mu-law, so the oracle entry rides A-law)."""
    table = _ULAW_EXPAND if law == "ulaw" else _ALAW_EXPAND
    # nearest-code by decision boundaries: codes sorted by linear value,
    # each sample mapped to the code whose quantization cell contains it
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int32)
    cuts = (levels[:-1] + levels[1:]) // 2
    idx = np.searchsorted(cuts, pcm.astype(np.int32), side="right")
    return order[idx].astype(np.uint8).tobytes()


def wav_g711_bytes(codes: bytes, law: str = "ulaw", sample_rate: int = 8000) -> bytes:
    """Spec-valid RIFF/WAVE G.711 writer: format tag 7 (mu-law) or 6 (A-law),
    one byte per sample — the telephony container shape."""
    fmt_tag = 7 if law == "ulaw" else 6
    data = bytes(codes)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, 1, sample_rate, sample_rate, 1, 8)
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
    if audio_format in (6, 7):  # G.711 A-law / mu-law (one code byte/sample)
        codec = "alaw" if audio_format == 6 else "ulaw"
        samples = g711_expand(data, codec)  # decoded linear int16
    elif audio_format == 1 and bits in (8, 16):
        codec = "pcm"
        samples = np.frombuffer(data, dtype=np.uint8 if bits == 8 else np.dtype("<i2"))
    else:
        raise ValueError(
            f"only 8/16-bit PCM and G.711 supported (format={audio_format}, bits={bits})"
        )
    if channels > 1:
        samples = samples[: samples.size // channels * channels].reshape(-1, channels)
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "codec": codec,
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


# ----------------------------------------------------------------- PNG
# Pure-stdlib PNG (RFC 2083 / ISO 15948): zlib is in the Python standard
# library, so unlike JPEG nothing here needs hand-rolled entropy coding —
# the codec work is the chunk grammar (length/tag/body/CRC32), the five
# scanline predictors (None/Sub/Up/Average/Paeth), the three integer color
# types (0 grayscale, 2 truecolor, 3 indexed+PLTE) and Adam7 interlacing
# (seven sub-images, each filtered independently — the progressive-JPEG
# analog on the prediction side). Bit depth 8 only; 1/2/4/16-bit packing
# and color type 4/6 alpha raise loudly instead of mis-decoding.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: Adam7 pass origins/strides (x0, y0, dx, dy), spec order
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _paeth_vec(a, b, c):
    """Paeth predictor (PNG filter 4), vectorized over int16 arrays: nearest
    of (left, up, upper-left) to p = left + up - upper_left, ties broken
    left -> up -> upper-left per spec."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter `ftype` to one raw scanline (uint8, width*bpp bytes);
    `prev` is the RECONSTRUCTED prior scanline (zeros at a pass start)."""
    r = row.astype(np.int16)
    up = prev.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), r[:-bpp]]) if r.size else r
    ul = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]]) if up.size else up
    if ftype == 0:
        d = r
    elif ftype == 1:
        d = r - left
    elif ftype == 2:
        d = r - up
    elif ftype == 3:
        d = r - ((left + up) >> 1)
    elif ftype == 4:
        d = r - _paeth_vec(left, up, ul)
    else:
        raise ValueError(f"PNG filter type {ftype} out of range")
    return (d & 0xFF).astype(np.uint8)


def _png_unfilter_row(ftype: int, data: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline from its filtered bytes. Up is vectorized;
    Sub reduces to a per-channel cumulative sum; Average/Paeth carry a true
    left-neighbor recurrence, so they walk the row (rows here are short —
    at scale a cluster registers a real decoder via register_decoder)."""
    n = data.size
    if ftype == 0:
        return data.copy()
    if ftype == 2:
        return ((data.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
    if ftype == 1:
        # recon[i] = data[i] + recon[i-bpp]: cumsum per byte lane, mod 256
        lanes = data[: n - n % bpp].reshape(-1, bpp).astype(np.int64)
        out = np.cumsum(lanes, axis=0) & 0xFF
        return out.astype(np.uint8).reshape(-1)
    out = np.zeros(n, np.int16)
    up = prev.astype(np.int16)
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = up[i]
        c = up[i - bpp] if i >= bpp else 0
        if ftype == 3:
            pred = (a + b) >> 1
        else:  # 4 — scalar Paeth, same tie-break order as _paeth_vec
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (int(data[i]) + pred) & 0xFF
    return out.astype(np.uint8)


def _png_pass_views(w: int, h: int, interlace: int):
    """Yield (x0, y0, dx, dy, pw, ph) for each non-empty sub-image: the seven
    Adam7 passes, or the single pass of a sequential image."""
    passes = _ADAM7 if interlace == 1 else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def png_encode(
    img: np.ndarray,
    color_type: int = 0,
    interlace: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Spec-valid PNG writer over a uint8 array: (h, w) for grayscale (0) or
    indexed (3, with `palette` (n,3) — identity grayscale when omitted),
    (h, w, 3) for truecolor (2). Scanline filters CYCLE through all five
    predictors (row index mod 5, per pass), so a correct decoder must
    implement every filter to round-trip even a constant image; interlace=1
    writes the seven Adam7 passes, each filtered independently."""
    img = np.asarray(img, dtype=np.uint8)
    if color_type == 2:
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("color_type 2 needs an (h, w, 3) array")
        bpp = 3
    elif color_type in (0, 3):
        if img.ndim != 2:
            raise ValueError(f"color_type {color_type} needs an (h, w) array")
        bpp = 1
    else:
        raise ValueError(f"unsupported PNG color type {color_type}")
    h, w = img.shape[:2]
    raw = bytearray()
    for x0, y0, dx, dy, pw, ph in _png_pass_views(w, h, interlace):
        sub = img[y0::dy, x0::dx].reshape(ph, pw * bpp)
        prev = np.zeros(pw * bpp, np.uint8)
        for r in range(ph):
            ftype = r % 5
            raw.append(ftype)
            raw += _png_filter_row(ftype, sub[r], prev, bpp).tobytes()
            prev = sub[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            palette = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        out += _png_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    return out + _png_chunk(b"IEND", b"")


def png_bytes(gray: bytes, height: int = 5, color_type: int = 0, interlace: int = 0) -> bytes:
    """PNG builder for the contract queries: `height` identical rows of the
    source bytes (width = byte count). With the encoder's cycling row
    filters, decoding exercises every predictor; the recovered pixel bytes
    are exactly `height` copies of `gray` (SQL oracle: md5(repeat(text, h)))."""
    row = np.frombuffer(bytes(gray), dtype=np.uint8)
    img = np.tile(row, (height, 1))
    if color_type == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return png_encode(img, color_type=color_type, interlace=interlace)


def decode_png(payload: bytes) -> dict:
    """PNG parser: signature, chunk walk with CRC32 verification, IHDR
    validation, zlib inflate, per-pass unfiltering (all five predictors),
    PLTE application for indexed images, Adam7 de-interlacing. Supports bit
    depth 8, color types 0/2/3, both interlace methods; anything else —
    including unknown CRITICAL chunks — raises instead of mis-decoding."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat, ended = len(_PNG_SIG), None, None, bytearray(), False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            ended = True
            break
        elif not (tag[0] & 0x20):  # critical bit clear = critical chunk
            raise ValueError(f"unsupported critical PNG chunk {tag!r}")
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("truncated PNG (missing IHDR or IEND)")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2, 3) or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, color_type={ctype}, "
            f"compression={comp}, filter={filt}, interlace={interlace})"
        )
    if ctype == 3 and plte is None:
        raise ValueError("indexed PNG without PLTE")
    bpp = 3 if ctype == 2 else 1
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    img = np.zeros((h, w * bpp), np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph in _png_pass_views(w, h, interlace):
        stride = pw * bpp
        prev = np.zeros(stride, np.uint8)
        for r in range(ph):
            if off + 1 + stride > raw.size:
                raise ValueError("PNG pixel data truncated")
            ftype = int(raw[off])
            row = _png_unfilter_row(ftype, raw[off + 1 : off + 1 + stride], prev, bpp)
            off += 1 + stride
            if bpp == 1:
                img[y0 + r * dy, x0::dx] = row
            else:
                img[y0 + r * dy].reshape(w, 3)[x0::dx] = row.reshape(pw, 3)
            prev = row
    if off != raw.size:
        raise ValueError("PNG pixel data has trailing bytes")
    px = img.reshape(h, w, 3) if bpp == 3 else img
    if ctype == 3:
        px = plte[px]  # indexed -> RGB through the palette
    return {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": ctype,
        "interlace": interlace,
        "pixels": px,
    }


# ----------------------------------------------------------------- GIF
# Pure-stdlib GIF87a/89a (the spec's entropy coder is variable-width LZW,
# hand-rolled here like JPEG's Huffman — zlib does not apply). Covered:
# global/local color tables, the 4-pass row interlace, sub-block framing,
# graphic-control extensions (transparency, disposal 0/1/2/3), and
# multi-frame animation with per-frame canvas compositing — which makes GIF
# the repo's real VIDEO-kind container: frame sampling decodes an actual
# frame sequence instead of slicing bytes at a fixed stride.

#: interlace pass (row start, row stride), spec order
_GIF_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW: emits CLEAR, the code stream (LSB-first bit
    packing, width grows as the table fills, table reset via CLEAR at 4096),
    then END. Returns the raw code bytes (sub-block framing is the caller's)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n_bits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt, width = end + 1, min_code_size + 1
    put(clear, width)
    cur = b""
    for byte in indices:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        else:
            # table full: reset (exercises the decoder's mid-stream CLEAR)
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt, width = end + 1, min_code_size + 1
        cur = bytes([byte])
    if cur:
        put(table[cur], width)
    put(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of _gif_lzw_encode, including the KwKwK case (code == next
    unassigned entry) and mid-stream CLEAR resets. The decoder's width bump
    fires one entry earlier than the encoder's ((1<<w)-1 vs 1<<w) because it
    lags the encoder by exactly one table add."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    pos = acc = n_bits = 0

    def take(width: int) -> int:
        nonlocal pos, acc, n_bits
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = take(width)
        if code == end:
            return bytes(out)
        if code == clear:
            table = table[: end + 1]
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first code {code} not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def _gif_subblocks(data: bytes) -> bytes:
    """Frame `data` as GIF data sub-blocks: <=255-byte runs, 0 terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_bytes(
    gray: bytes,
    height: int = 4,
    n_frames: int = 1,
    interlace_alt: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """GIF89a writer: a 256-entry grayscale global color table (palette i =
    (i,i,i), so index == gray byte) and `n_frames` full-canvas frames, each
    `height` identical rows of the `gray` bytes (width = byte count). Every
    frame carries a graphic-control extension (disposal 1 = keep); with
    `interlace_alt` odd frames are written row-interlaced, so one payload
    exercises both row orders. Animations get the Netscape loop extension."""
    w, h = len(gray), height
    out = bytearray(b"GIF89a")
    # logical screen: GCT present, color resolution 8, GCT size 2^(7+1)=256
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    if n_frames > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _gif_subblocks_app(b"\x01\x00\x00")
    rows = bytes(gray) * h
    for k in range(n_frames):
        lace = interlace_alt and (k % 2 == 1)
        out += b"\x21\xf9" + _gif_subblocks_app(
            struct.pack("<BHB", 0x04, delay_cs, 0)  # disposal 1, no transparency
        )
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if lace else 0)
        px = rows
        if lace and h > 1:
            order = [r for start, step in _GIF_PASSES for r in range(start, h, step)]
            px = b"".join(rows[r * w : (r + 1) * w] for r in order)
        out.append(8)  # LZW min code size (256-entry table)
        out += _gif_subblocks(_gif_lzw_encode(px, 8))
    out.append(0x3B)  # trailer
    return bytes(out)


def _gif_subblocks_app(data: bytes) -> bytes:
    """Sub-block framing for extension bodies (identical wire format)."""
    return _gif_subblocks(data)


def decode_gif(payload: bytes) -> dict:
    """GIF parser: header + logical screen descriptor, global/local color
    tables, extension-block walk (graphic control honored: transparency
    index, disposal none/keep/background/previous; comment/app skipped),
    image descriptors at arbitrary offsets composited onto the canvas,
    per-frame LZW decode at any min code size, 4-pass de-interlacing.
    Returns every frame's post-composite canvas as grayscale (palette R
    channel) — GIF is the one container here with real animation, so
    `frames` has shape (n_frames, h, w)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    def subblocks(p: int) -> tuple[bytes, int]:
        body = bytearray()
        while True:
            size = payload[p]
            p += 1
            if size == 0:
                return bytes(body), p
            body += payload[p : p + size]
            p += size

    bg_val = int(gct[bg, 0]) if gct is not None and bg < len(gct) else 0
    canvas = np.full((h, w), bg_val, dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = subblocks(pos)
            if label == 0xF9 and len(body) >= 3:
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[2] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        pal = gct
        if fpacked & 0x80:  # local color table overrides
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = subblocks(pos)
        idx = np.frombuffer(_gif_lzw_decode(data, mcs), np.uint8)
        if idx.size != fw * fh:
            raise ValueError(f"frame pixel count {idx.size} != {fw}x{fh}")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:  # de-interlace
            ordered = np.empty_like(idx)
            rows = [r for start, step in _GIF_PASSES for r in range(start, fh, step)]
            ordered[rows] = idx
            idx = ordered
        saved = canvas[top : top + fh, left : left + fw].copy()
        gray = pal[np.minimum(idx, len(pal) - 1), 0]
        if transparent is not None:
            keep = idx == transparent
            gray = np.where(keep, canvas[top : top + fh, left : left + fw], gray)
        canvas[top : top + fh, left : left + fw] = gray
        frames.append(canvas.copy())
        if disposal == 2:  # restore background in the frame's rect
            canvas[top : top + fh, left : left + fw] = bg_val
        elif disposal == 3:  # restore previous canvas content
            canvas[top : top + fh, left : left + fw] = saved
        transparent, disposal = None, 0
    return {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "frames": np.stack(frames) if frames else np.zeros((0, h, w), np.uint8),
    }


# --------------------------------------------------------- baseline JPEG
# Pure-numpy baseline-DCT JPEG (ITU T.81): a real encoder and a real decoder
# — markers, standard Annex K Huffman tables, zigzag, quantization, 8x8
# DCT/IDCT, byte stuffing. Grayscale (one component), sequential baseline
# only (SOF0); progressive/arithmetic/multi-component raise. All constants
# below are from the public JPEG specification.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3.1 standard luminance Huffman tables
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # 1-pad to byte boundary per spec

    def raw(self, data: bytes) -> None:
        """Append marker bytes verbatim (no stuffing) — caller must align()."""
        assert self.n == 0, "raw marker emission requires byte alignment"
        self.buf.extend(data)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_const_block(w: "_BitWriter", v: int, prev_dc: int, q, dc_huf, ac_huf, C) -> int:
    """Entropy-encode one constant 8x8 block (DCT -> quantize -> zigzag ->
    Huffman); returns the new DC predictor. The pipeline is the general one —
    constancy only means the AC pass emits a single EOB."""
    block = np.full((8, 8), float(int(v)) - 128.0)
    coef = C @ block @ C.T
    zz = np.round(coef.reshape(64)[_ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - prev_dc
    prev_dc = int(zz[0])
    size = _category(diff)
    code, length = dc_huf[size]
    w.put(code, length)
    if size:
        w.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        a = int(zz[k])
        if a == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_huf[0xF0]  # ZRL
            w.put(zc, zl)
            run -= 16
        s = _category(a)
        cc, cl = ac_huf[(run << 4) | s]
        w.put(cc, cl)
        w.put(a if a > 0 else a + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_huf[0x00]  # EOB
        w.put(ec, el)
    return prev_dc


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_headers(
    q: np.ndarray,
    width: int,
    height: int,
    ncomp: int,
    restart_interval,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    out = b"\xff\xd8"  # SOI
    out += _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _jpeg_seg(0xDB, b"\x00" + bytes(int(x) for x in q))  # DQT id 0, 8-bit
    # SOF0: components ids 1..ncomp, per-component (h,v) sampling (default
    # 1x1 = 4:4:4), all on qtable 0
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        h, v = sampling[ci] if sampling else (1, 1)
        sof += bytes([ci + 1, (h << 4) | v, 0x00])
    out += _jpeg_seg(0xC0, sof)
    out += _jpeg_seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC 0
    out += _jpeg_seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
    if restart_interval:
        out += _jpeg_seg(0xDD, struct.pack(">H", int(restart_interval)))  # DRI
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # every component -> tables 0/0
    out += _jpeg_seg(0xDA, sos + b"\x00\x3f\x00")
    return out


#: chroma derivations for the exactly-invertible color stream: per input byte
#: v, the MCU carries constant blocks Y=v, Cb=v^0xFF, Cr=(v+85)%256 — three
#: DIVERGING DC predictor chains, so interleaved decode order and per-
#: component predictor reset at restarts are both load-bearing.
def _color_planes_of(v: int) -> tuple[int, int, int]:
    return v, v ^ 0xFF, (v + 85) % 256


def jpeg_bytes(
    gray: bytes,
    qtable: np.ndarray | None = None,
    restart_interval: int | None = None,
) -> bytes:
    """Baseline JPEG encoder for a one-block-row grayscale image: each input
    byte becomes one constant 8x8 block (width = 8*len, height = 8). The
    entropy pipeline (DCT -> quantize -> zigzag -> Annex-K Huffman) is the
    real general one; the constant-block layout plus an all-ones quant table
    is what makes the codec EXACTLY invertible (a constant block is DC-only
    and the DC quantizer divides the DCT gain), giving the decode path an
    md5-round-trip oracle like the WAV/PPM containers.

    restart_interval=n emits a DRI segment and an RSTn marker every n MCUs
    (byte-aligned scan, D0..D7 cycling, DC predictor reset) — the stream
    shape hardware encoders emit for error resilience."""
    data = np.frombuffer(bytes(gray), dtype=np.uint8)
    n_blocks = max(1, data.size)  # zero-length text still needs a legal frame
    q = np.ones(64, dtype=np.int64) if qtable is None else np.asarray(qtable, dtype=np.int64).reshape(64)
    dc_huf = _huff_codes(_DC_BITS, _DC_VALS)
    ac_huf = _huff_codes(_AC_BITS, _AC_VALS)
    C = _dct_matrix()

    w = _BitWriter()
    prev_dc = 0
    blocks = data if data.size else np.zeros(1, dtype=np.uint8)
    for i, v in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            w.align()
            w.raw(bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)]))
            prev_dc = 0
        prev_dc = _encode_const_block(w, int(v), prev_dc, q, dc_huf, ac_huf, C)
    scan = w.flush()
    return (
        _jpeg_headers(q, 8 * n_blocks, 8, 1, restart_interval) + scan + b"\xff\xd9"
    )


def jpeg_color_bytes(
    gray: bytes,
    qtable: np.ndarray | None = None,
    restart_interval: int | None = None,
) -> bytes:
    """Three-component (YCbCr 4:4:4) baseline JPEG: each input byte v becomes
    one interleaved MCU of constant blocks Y=v, Cb=v^0xFF, Cr=(v+85)%256 —
    three diverging DC predictor chains through one entropy-coded scan, so
    decoding exercises real interleaved-MCU order and (with restart_interval)
    per-component predictor resets at RSTn. Same exact-invertibility layout
    as jpeg_bytes, so the Y plane round-trips the input bit-for-bit."""
    data = np.frombuffer(bytes(gray), dtype=np.uint8)
    n_mcus = max(1, data.size)
    q = np.ones(64, dtype=np.int64) if qtable is None else np.asarray(qtable, dtype=np.int64).reshape(64)
    dc_huf = _huff_codes(_DC_BITS, _DC_VALS)
    ac_huf = _huff_codes(_AC_BITS, _AC_VALS)
    C = _dct_matrix()

    w = _BitWriter()
    prev = [0, 0, 0]
    blocks = data if data.size else np.zeros(1, dtype=np.uint8)
    for i, v in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            w.align()
            w.raw(bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)]))
            prev = [0, 0, 0]
        for ci, val in enumerate(_color_planes_of(int(v))):
            prev[ci] = _encode_const_block(w, val, prev[ci], q, dc_huf, ac_huf, C)
    scan = w.flush()
    return (
        _jpeg_headers(q, 8 * n_mcus, 8, 3, restart_interval) + scan + b"\xff\xd9"
    )


#: per-byte Y quad for the 4:2:0 stream: the four luma blocks of one MCU in
#: spec raster order (0,0),(0,1),(1,0),(1,1). DISTINCT values so a decoder
#: that walks the intra-MCU block order wrong produces wrong pixels at known
#: positions instead of an accidentally-identical plane.
def _y_quad_of(v: int) -> tuple[int, int, int, int]:
    return v, v ^ 0x55, v ^ 0xAA, v ^ 0xFF


def jpeg420_bytes(
    gray: bytes,
    qtable: np.ndarray | None = None,
    restart_interval: int | None = None,
) -> bytes:
    """Chroma-subsampled (YCbCr 4:2:0) baseline JPEG — the sampling layout
    virtually every camera and web encoder emits: each input byte v becomes
    one 16x16 MCU of SIX blocks — four distinct constant luma blocks
    (v, v^0x55, v^0xAA, v^0xFF in raster order) followed by one Cb (v^0xFF)
    and one Cr ((v+85)%256) block at quarter resolution. Decoding exercises
    the general MCU geometry (per-component sampling factors, data-unit
    order Y00 Y01 Y10 Y11 Cb Cr), three diverging DC predictor chains, and
    (with restart_interval, counted in MCUs) predictor resets at RSTn. Same
    constant-block + unit-quantizer exact-invertibility as jpeg_bytes: the
    top-left pixel of each MCU round-trips the input bit-for-bit."""
    data = np.frombuffer(bytes(gray), dtype=np.uint8)
    n_mcus = max(1, data.size)
    q = np.ones(64, dtype=np.int64) if qtable is None else np.asarray(qtable, dtype=np.int64).reshape(64)
    dc_huf = _huff_codes(_DC_BITS, _DC_VALS)
    ac_huf = _huff_codes(_AC_BITS, _AC_VALS)
    C = _dct_matrix()

    w = _BitWriter()
    prev = [0, 0, 0]
    mcus = data if data.size else np.zeros(1, dtype=np.uint8)
    for i, v in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            w.align()
            w.raw(bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)]))
            prev = [0, 0, 0]
        _, cb, cr = _color_planes_of(int(v))
        for y in _y_quad_of(int(v)):
            prev[0] = _encode_const_block(w, y, prev[0], q, dc_huf, ac_huf, C)
        prev[1] = _encode_const_block(w, cb, prev[1], q, dc_huf, ac_huf, C)
        prev[2] = _encode_const_block(w, cr, prev[2], q, dc_huf, ac_huf, C)
    scan = w.flush()
    return (
        _jpeg_headers(
            q, 16 * n_mcus, 16, 3, restart_interval, sampling=[(2, 2), (1, 1), (1, 1)]
        )
        + scan
        + b"\xff\xd9"
    )


# --- progressive (SOF2) encoding: spectral selection + successive
# --- approximation, per T.81 Annex G. The AC refinement encoder mirrors the
# --- decoder's correction-bit walk: bits for already-significant
# --- coefficients buffer until the symbol (ZRL / newly-significant / EOBn)
# --- that covers them is emitted.

#: AC Huffman table for progressive scans: the Annex-K sequential table has
#: no EOBn symbols (cat<<4, cat 1..14 — variable-length end-of-band runs are
#: progressive-only), so emit a custom canonical table carrying every symbol
#: a progressive AC scan can produce — all 176 at length 9 (2^9 = 512 code
#: space, all-ones code unused per K.2). Real encoders ship size-optimized
#: tables; the decoder reads whatever DHT declares, so the fixed table only
#: costs stream size, never compatibility.
_PROG_AC_VALS = (
    [cat << 4 for cat in range(15)]  # EOBn: EOB0 .. EOB14
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[8] = len(_PROG_AC_VALS)  # every symbol at code length 9


def _flush_corr_bits(w: "_BitWriter", st: dict) -> None:
    for b in st["bits"]:
        w.put(b, 1)
    st["bits"] = []


def _emit_eobrun(w: "_BitWriter", ac_huf, st: dict) -> None:
    if st["eobrun"] > 0:
        run = st["eobrun"]
        cat = run.bit_length() - 1
        code, ln = ac_huf[cat << 4]
        w.put(code, ln)
        if cat:
            w.put(run - (1 << cat), cat)
        st["eobrun"] = 0
        # correction bits buffered under this EOB run follow its symbol —
        # the decoder pays them while sweeping the covered bands. With no
        # pending run the buffer belongs to a LATER covering symbol (ZRL /
        # newly-significant), so it must stay buffered here.
        _flush_corr_bits(w, st)


def _enc_dc_first(w, dcval: int, prev: int, Al: int, dc_huf) -> int:
    v = int(dcval) >> Al  # DC point transform: arithmetic shift (G.1.2.1)
    diff = v - prev
    size = _category(diff)
    code, ln = dc_huf[size]
    w.put(code, ln)
    if size:
        w.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    return v


def _enc_ac_first_block(w, zz, Ss: int, Se: int, Al: int, ac_huf, st: dict) -> None:
    """One block of an AC first scan (Ah=0): values at point transform Al
    (magnitude shift, sign preserved), zero runs + ZRL, trailing zeros and
    all-zero blocks folded into a shared EOBRUN."""
    vals = []
    for k in range(Ss, Se + 1):
        a = int(zz[k])
        t = (a if a >= 0 else -a) >> Al
        vals.append(t if a >= 0 else -t)
    last_nz = max((i for i, v in enumerate(vals) if v), default=-1)
    if last_nz < 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(w, ac_huf, st)
        return
    _emit_eobrun(w, ac_huf, st)
    r = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_huf[0xF0]
            w.put(code, ln)
            r -= 16
        s = _category(v)
        code, ln = ac_huf[(r << 4) | s]
        w.put(code, ln)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if last_nz < len(vals) - 1:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(w, ac_huf, st)


def _enc_ac_refine_block(w, zz, Ss: int, Se: int, Al: int, ac_huf, st: dict) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-significant
    coefficients (|v|>>Al == 1) emit (run|1)+sign where run counts only
    zero-history positions; every already-significant coefficient passed
    over contributes one buffered correction bit, flushed after the covering
    symbol — the exact mirror of the decoder's G.1.2.3 walk."""
    ts = []
    for k in range(Ss, Se + 1):
        a = int(zz[k])
        ts.append(((a if a >= 0 else -a) >> Al, a > 0))
    last_new = max((i for i, (t, _) in enumerate(ts) if t == 1), default=-1)
    r = 0
    # two correction-bit buffers (jcphuff's BE/BR split): st["bits"] is owned
    # by the pending EOB run and flushes with its EOBn symbol; `br` holds
    # bits buffered in THIS block since the last symbol and flushes after
    # the next ZRL / newly-significant symbol — conflating them would hand
    # the decoder's EOB-run sweep bits that belong to a later block.
    br: list[int] = []
    for i in range(last_new + 1):
        t, pos = ts[i]
        if t == 0:
            r += 1
            continue
        # ZRLs are emitted EAGERLY at the next nonzero position once 16+
        # zero-history positions accumulated — also before a mere correction
        # bit — so the bits flushed after each ZRL never outrun the
        # decoder's 16-zero-history advance (the jcphuff emission order)
        while r > 15:
            _emit_eobrun(w, ac_huf, st)
            code, ln = ac_huf[0xF0]
            w.put(code, ln)
            r -= 16
            for b in br:
                w.put(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _emit_eobrun(w, ac_huf, st)  # a pending EOB run ends before this symbol
        code, ln = ac_huf[(r << 4) | 1]
        w.put(code, ln)
        w.put(1 if pos else 0, 1)
        for b in br:
            w.put(b, 1)
        br = []
        r = 0
    if last_new < len(ts) - 1:
        # block folds into the EOB run: its unflushed bits become run-owned
        st["bits"].extend(br)
        st["bits"].extend(t & 1 for t, _ in ts[last_new + 1 :] if t > 1)
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF or len(st["bits"]) > 900:
            _emit_eobrun(w, ac_huf, st)


def _progressive_stream(
    comp_blocks: list[np.ndarray],
    width: int,
    height: int,
    sampling: list[tuple[int, int]],
    q: np.ndarray,
    scans: list[tuple],
    restart_interval: int | None = None,
) -> bytes:
    """Assemble a progressive (SOF2) stream from per-component quantized
    zigzag coefficient arrays (nby, nbx, 64). `scans` is the scan script:
    ("dc", [ci, ...], Ah, Al) — interleaved when multiple components — or
    ("ac", ci, Ss, Se, Ah, Al). Block grids must be exact multiples of the
    MCU grid (the builders' one-MCU-row layouts are). Restart markers, when
    configured, are emitted every `restart_interval` MCUs/blocks in every
    scan, resetting DC predictors and ending any open EOB run."""
    dc_huf = _huff_codes(_DC_BITS, _DC_VALS)
    ac_huf = _huff_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    ncomp = len(comp_blocks)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mx = (width + 8 * hmax - 1) // (8 * hmax)
    my = (height + 8 * vmax - 1) // (8 * vmax)
    out = b"\xff\xd8"
    out += _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_seg(0xDB, b"\x00" + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        h, v = sampling[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0x00])
    out += _jpeg_seg(0xC2, sof)
    out += _jpeg_seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _jpeg_seg(0xC4, b"\x10" + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS))
    if restart_interval:
        out += _jpeg_seg(0xDD, struct.pack(">H", int(restart_interval)))

    def rst(w, idx):
        w.align()
        w.raw(bytes([0xFF, 0xD0 + ((idx // restart_interval - 1) % 8)]))

    for scan in scans:
        w = _BitWriter()
        if scan[0] == "dc":
            _, cis, ah, al = scan
            sos = bytes([len(cis)])
            for ci in cis:
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 0, (ah << 4) | al])
            if len(cis) > 1:
                units = [
                    [
                        (ci, mcu_y * sampling[ci][1] + vv, mcu_x * sampling[ci][0] + hh)
                        for ci in cis
                        for vv in range(sampling[ci][1])
                        for hh in range(sampling[ci][0])
                    ]
                    for mcu_y in range(my)
                    for mcu_x in range(mx)
                ]
            else:
                ci = cis[0]
                nby, nbx = comp_blocks[ci].shape[:2]
                units = [[(ci, by, bx)] for by in range(nby) for bx in range(nbx)]
            prev = {ci: 0 for ci in cis}
            for mcu, mcu_units in enumerate(units):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    rst(w, mcu)
                    prev = {ci: 0 for ci in cis}
                for ci, by, bx in mcu_units:
                    dc = comp_blocks[ci][by, bx, 0]
                    if ah == 0:
                        prev[ci] = _enc_dc_first(w, dc, prev[ci], al, dc_huf)
                    else:
                        w.put((int(dc) >> al) & 1, 1)
        else:
            _, ci, ss, se, ah, al = scan
            sos = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
            st = {"eobrun": 0, "bits": []}
            nby, nbx = comp_blocks[ci].shape[:2]
            for bi, (by, bx) in enumerate(
                (by, bx) for by in range(nby) for bx in range(nbx)
            ):
                if restart_interval and bi and bi % restart_interval == 0:
                    _emit_eobrun(w, ac_huf, st)
                    rst(w, bi)
                zz = comp_blocks[ci][by, bx]
                if ah == 0:
                    _enc_ac_first_block(w, zz, ss, se, al, ac_huf, st)
                else:
                    _enc_ac_refine_block(w, zz, ss, se, al, ac_huf, st)
            _emit_eobrun(w, ac_huf, st)
        out += _jpeg_seg(0xDA, sos) + w.flush()
    return out + b"\xff\xd9"


def jpeg_progressive_bytes(
    gray: bytes,
    qtable: np.ndarray | None = None,
    restart_interval: int | None = None,
    ncomp: int = 1,
) -> bytes:
    """Progressive (SOF2) JPEG with the same exact-invertibility contract as
    jpeg_bytes / jpeg_color_bytes: each input byte is one constant 8x8 block
    (ncomp=1) or one 4:4:4 YCbCr MCU (ncomp=3, chroma = the fixed
    derivations of Y), unit quantizers. Scan script: DC first at Al=1
    (interleaved when color), a DC refinement bit plane, then per component
    an AC first scan (1..63, Al=1) and its refinement — all-zero AC bands,
    so the AC scans are pure shared-EOBRUN streams, the progressive
    structure real decoders must walk. The decoded Y plane round-trips the
    input bit-for-bit."""
    data = np.frombuffer(bytes(gray), dtype=np.uint8)
    n = max(1, data.size)
    q = np.ones(64, dtype=np.int64) if qtable is None else np.asarray(qtable, dtype=np.int64).reshape(64)
    vals = data if data.size else np.zeros(1, dtype=np.uint8)
    comp_blocks = []
    for ci in range(ncomp):
        arr = np.zeros((1, n, 64), dtype=np.int64)
        for i, v in enumerate(vals):
            plane_v = int(v) if ncomp == 1 else _color_planes_of(int(v))[ci]
            # constant block: DC-only, DCT gain 8, unit DC quantizer
            arr[0, i, 0] = 8 * (plane_v - 128)
        comp_blocks.append(arr)
    scans: list[tuple] = [("dc", list(range(ncomp)), 0, 1), ("dc", list(range(ncomp)), 1, 0)]
    for ci in range(ncomp):
        scans.append(("ac", ci, 1, 63, 0, 1))
        scans.append(("ac", ci, 1, 63, 1, 0))
    return _progressive_stream(
        comp_blocks,
        8 * n,
        8,
        [(1, 1)] * ncomp,
        q,
        scans,
        restart_interval=restart_interval,
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    b = 0  # marker reached (EOI): spec-legal 0 padding
                    self.pos -= 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def take(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:
            self.acc <<= length - self.n
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        return v

    def restart(self) -> int:
        """Consume an RSTn marker at the current byte boundary: drop the
        scan's 1-padding bits (any unread bits are pad or the synthetic
        zeros _fill feeds at a marker — _fill never advances past an FF, so
        pos sits exactly on the marker), read FF Dn, return n. Caller resets
        the DC predictors per the spec."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker in scan")
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RSTn marker, got ff{m:02x}")
        self.pos += 2
        return m - 0xD0


def _huff_decode_tables(bits: list[int], vals: list[int]):
    """Per-length (first_code, first_index) canonical decode table."""
    table, code, i = [], 0, 0
    for length in range(1, 17):
        table.append((code, i, bits[length - 1]))
        code = (code + bits[length - 1]) << 1
        i += bits[length - 1]
    return table, vals


def _read_symbol(r: _BitReader, table, vals) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.take(1)
        first, idx, count = table[length - 1]
        if count and first <= code < first + count:
            return vals[idx + (code - first)]
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(r: _BitReader, dc_tab, ac_tab, prev_dc: int) -> tuple[np.ndarray, int]:
    """Entropy-decode one block's zigzag coefficients; returns (zz, new_dc)."""
    zz = np.zeros(64, dtype=np.int64)
    size = _read_symbol(r, *dc_tab)
    prev_dc += _extend(r.take(size), size) if size else 0
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_symbol(r, *ac_tab)
        if sym == 0x00:  # EOB
            break
        run, s = sym >> 4, sym & 0xF
        if s == 0:
            if run != 15:
                raise ValueError("invalid AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r.take(s), s)
        k += 1
    return zz, prev_dc


def decode_jpeg(payload: bytes) -> dict:
    """Baseline sequential JPEG decoder: marker walk (DQT/DHT/SOF0/DRI/SOS),
    canonical Huffman scan decode with byte unstuffing, restart-interval
    handling (RSTn sequence check, bit realign, per-component DC predictor
    reset), dequantize, inverse zigzag, IDCT, level shift. Supports one
    (grayscale) or three (YCbCr) components at any integer-ratio sampling —
    4:4:4, 4:2:2, 4:2:0 (general per-component h x v MCU geometry, data
    units in spec raster order, subsampled planes box-upsampled to frame
    resolution); raises on progressive (SOF2) and arithmetic coding.
    Grayscale returns pixels (h, w); color returns pixels (h, w, 3) in frame
    component order with ncomp=3, plus the parsed sampling factors and the
    MCU pixel width."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    width = height = None
    scan_start = None
    comps: list[tuple[int, int]] = []  # frame order: (component id, quant id)
    sel: dict[int, tuple[int, int]] = {}  # component id -> (dc table, ac table)
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        size = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8).astype(np.int64)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                huff[(tc, th)] = _huff_decode_tables(bits, vals)
                b += 17 + nv
        elif marker == 0xC0:
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp not in (1, 3):
                raise ValueError("only 1- (gray) or 3-component (YCbCr) baseline supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                h, v = samp >> 4, samp & 0xF
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(f"illegal sampling factors {h}x{v}")
                comps.append((cid, tq, h, v))
            if sum(h * v for _, _, h, v in comps) > 10:
                raise ValueError("blocks per MCU > 10 (spec B.2.3)")
            if ncomp == 1:
                # single-component scans are non-interleaved: the MCU is one
                # data unit regardless of the SOF sampling factors (A.2.2)
                comps = [(comps[0][0], comps[0][1], 1, 1)]
        elif marker == 0xC2:
            # progressive DCT: multi-scan spectral-selection / successive-
            # approximation stream — handled by the dedicated scan machinery
            return _decode_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline (SOF0) and progressive (SOF2) DCT supported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps):
                raise ValueError("scan components != frame components")
            for si in range(ns):
                scid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                sel[scid] = (tabs >> 4, tabs & 0xF)
            scan_start = pos + 2 + size
            break
        pos += 2 + size
    if scan_start is None or width is None:
        raise ValueError("missing SOS/SOF0")
    C = _dct_matrix()
    ncomp = len(comps)
    hmax = max(h for _, _, h, _ in comps)
    vmax = max(v for _, _, _, v in comps)
    for _, _, h, v in comps:
        if hmax % h or vmax % v:
            # spec-legal but unused in practice; upsampling by replication
            # needs integer ratios — refuse loudly rather than mis-decode
            raise ValueError(f"non-integer sampling ratio {h}x{v} vs {hmax}x{vmax}")
    # MCU grid: each MCU covers 8*hmax x 8*vmax pixels; component ci decodes
    # h_i x v_i data units per MCU into a plane at its OWN resolution
    mx = (width + 8 * hmax - 1) // (8 * hmax)
    my = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((my * v * 8, mx * h * 8), dtype=np.uint8) for _, _, h, v in comps]
    r = _BitReader(payload[scan_start:])
    prev = [0] * ncomp
    inv = np.argsort(_ZIGZAG)
    for mcu in range(mx * my):
        if restart_interval and mcu and mcu % restart_interval == 0:
            m = r.restart()
            if m != (mcu // restart_interval - 1) % 8:
                raise ValueError("restart marker out of sequence")
            prev = [0] * ncomp  # spec: predictors reset at every restart
        mcu_y, mcu_x = divmod(mcu, mx)
        for ci, (cid, tq, h, v) in enumerate(comps):
            dc_id, ac_id = sel[cid]
            for vv in range(v):
                for hh in range(h):  # data-unit order within the MCU: raster
                    zz, prev[ci] = _decode_block(
                        r, huff[(0, dc_id)], huff[(1, ac_id)], prev[ci]
                    )
                    coef = (zz * qtables[tq])[inv].reshape(8, 8).astype(np.float64)
                    pix = C.T @ coef @ C + 128.0
                    y0, x0 = (mcu_y * v + vv) * 8, (mcu_x * h + hh) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                        np.round(pix), 0, 255
                    ).astype(np.uint8)
    # bring subsampled components to frame resolution by pixel replication
    # (the box upsample every fast decoder defaults to), then crop the
    # right/bottom MCU padding
    full = [
        np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)[:height, :width]
        for p, (_, _, h, v) in zip(planes, comps)
    ]
    pixels = full[0] if ncomp == 1 else np.stack(full, axis=-1)
    return {
        "width": int(width),
        "height": int(height),
        "pixels": pixels,
        "ncomp": ncomp,
        "sampling": [(h, v) for _, _, h, v in comps],
        "mcu_w": 8 * hmax,
    }


def _scan_end(payload: bytes, start: int) -> int:
    """Index of the first marker that terminates an entropy-coded segment
    (not a stuffed FF00, not RST0-7) — lets a multi-scan (progressive)
    stream resume the marker walk after each scan's data."""
    i, n = start, len(payload)
    while i < n:
        i = payload.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            return n
        m = payload[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        return i
    return n


def _prog_correct(coef: np.ndarray, k: int, r: "_BitReader", p1: int) -> None:
    """One AC-refinement correction bit for an already-nonzero coefficient:
    magnitude grows by 1<<Al toward its sign (G.1.2.3); the &p1 guard
    ignores a re-correction in a corrupt stream instead of overshooting."""
    if r.take(1) and not (int(coef[k]) & p1):
        coef[k] += p1 if coef[k] >= 0 else -p1


def _prog_scan_dc(r, units, huff, sel, coefs, Ah, Al, restart_interval):
    """DC scan (Ss=Se=0) over `units` = [(ci, by, bx), ...] in MCU order,
    grouped per MCU for restart accounting. First pass (Ah=0): normal DPCM
    decode, coefficient = predictor << Al. Refinement: one bit per data
    unit, OR'd in at bit Al (two's-complement bit-planes, so negative DC
    values reconstruct exactly)."""
    ncomp = len(coefs)
    prev = [0] * ncomp
    for mcu, mcu_units in enumerate(units):
        if restart_interval and mcu and mcu % restart_interval == 0:
            m = r.restart()
            if m != (mcu // restart_interval - 1) % 8:
                raise ValueError("restart marker out of sequence")
            prev = [0] * ncomp
        for ci, by, bx in mcu_units:
            if Ah == 0:
                size = _read_symbol(r, *huff[(0, sel[ci][0])])
                prev[ci] += _extend(r.take(size), size) if size else 0
                coefs[ci][by, bx, 0] = prev[ci] << Al
            elif r.take(1):
                coefs[ci][by, bx, 0] |= 1 << Al


def _prog_scan_ac(r, blocks, ac_tab, coef_arr, Ss, Se, Ah, Al, restart_interval):
    """AC scan (single component, non-interleaved) over `blocks` = [(by, bx),
    ...] in raster order. First pass (Ah=0): runs/EOBRUN/ZRL with values at
    point transform Al. Refinement (Ah>0): the G.1.2.3 correction-bit walk —
    newly-significant coefficients arrive as ±1<<Al, every already-nonzero
    coefficient passed over (including the whole band of EOB-run blocks)
    pays one correction bit. EOBRUN and, at restarts, the bit reader are the
    only inter-block state."""
    p1 = 1 << Al
    eobrun = 0
    for bi, (by, bx) in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            m = r.restart()
            if m != (bi // restart_interval - 1) % 8:
                raise ValueError("restart marker out of sequence")
            eobrun = 0
        coef = coef_arr[by, bx]
        k = Ss
        if Ah == 0:
            if eobrun:
                eobrun -= 1
                continue
            while k <= Se:
                sym = _read_symbol(r, *ac_tab)
                run, s = sym >> 4, sym & 0xF
                if s == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << run) - 1 + (r.take(run) if run else 0)
                    break
                k += run
                if k > Se:
                    raise ValueError("AC run past end of band")
                coef[k] = _extend(r.take(s), s) << Al
                k += 1
        else:
            if eobrun == 0:
                while k <= Se:
                    sym = _read_symbol(r, *ac_tab)
                    run, s = sym >> 4, sym & 0xF
                    newval = 0
                    if s:
                        if s != 1:
                            raise ValueError("refinement scan with |coef| > 1")
                        newval = p1 if r.take(1) else -p1
                    elif run != 15:
                        eobrun = (1 << run) + (r.take(run) if run else 0)
                        break
                    # advance over `run` zero-history positions, paying a
                    # correction bit at every already-nonzero one passed
                    while k <= Se:
                        if coef[k]:
                            _prog_correct(coef, k, r, p1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if s:
                        if k > Se:
                            raise ValueError("AC run past end of band")
                        coef[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    if coef[k]:
                        _prog_correct(coef, k, r, p1)
                    k += 1
                eobrun -= 1


def _planes_from_coefs(coefs, comps, qtables, C, inv):
    """Dequantize + inverse zigzag + IDCT a whole component of zigzag-order
    coefficient blocks (by, bx, 64) -> uint8 plane (by*8, bx*8), vectorized
    across blocks."""
    out = []
    for (cid, tq, h, v), cf in zip(comps, coefs):
        deq = (cf * qtables[tq][None, None, :])[:, :, inv].astype(np.float64)
        blocks = deq.reshape(*deq.shape[:2], 8, 8)
        pix = np.einsum("ji,yxjk,kl->yxil", C, blocks, C) + 128.0
        plane = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        out.append(plane.transpose(0, 2, 1, 3).reshape(plane.shape[0] * 8, plane.shape[1] * 8))
    return out


def _decode_progressive(payload: bytes) -> dict:
    """Progressive (SOF2) JPEG decoder: multi-scan marker walk where each
    SOS carries a spectral band [Ss, Se] and successive-approximation bit
    positions (Ah, Al) — DC scans (interleaved or not) first send the DPCM
    value at bit Al then one refinement bit per scan; AC scans (one
    component each, non-interleaved) send runs/EOBRUN at bit Al then
    correction-bit refinements. Coefficients accumulate across scans in
    zigzag order per component and are dequantized + IDCT'd once at EOI.
    Scan-header legality (B.2.3) is enforced: a DC band must be exactly
    [0,0], AC bands must not cross 0 or interleave components."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []
    coefs: list[np.ndarray] = []
    geom: dict[int, tuple] = {}  # ci -> (nb_x interleaved, nb_y, nb_x non-int, nb_y non-int)
    sel: dict[int, tuple[int, int]] = {}
    restart_interval = 0
    hmax = vmax = mx = my = 1
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        size = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8).astype(np.int64)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                huff[(tc, th)] = _huff_decode_tables(bits, vals)
                b += 17 + nv
        elif marker == 0xC2:
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component progressive supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                h, v = samp >> 4, samp & 0xF
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(f"illegal sampling factors {h}x{v}")
                comps.append((cid, tq, h, v))
            if sum(h * v for _, _, h, v in comps) > 10:
                raise ValueError("blocks per MCU > 10 (spec B.2.3)")
            if ncomp == 1:
                comps = [(comps[0][0], comps[0][1], 1, 1)]
            hmax = max(h for _, _, h, _ in comps)
            vmax = max(v for _, _, _, v in comps)
            for _, _, h, v in comps:
                if hmax % h or vmax % v:
                    raise ValueError(f"non-integer sampling ratio {h}x{v} vs {hmax}x{vmax}")
            mx = (width + 8 * hmax - 1) // (8 * hmax)
            my = (height + 8 * vmax - 1) // (8 * vmax)
            for ci, (cid, tq, h, v) in enumerate(comps):
                # coefficient store at interleaved-grid size; non-interleaved
                # scans address only the component's own ceil-dims (A.2.2)
                cw = (width * h + hmax - 1) // hmax
                ch = (height * v + vmax - 1) // vmax
                geom[ci] = (mx * h, my * v, (cw + 7) // 8, (ch + 7) // 8)
                coefs.append(np.zeros((my * v, mx * h, 64), dtype=np.int64))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("mixed frame markers in progressive stream")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_cis = []
            for si in range(ns):
                scid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                ci = next((i for i, c in enumerate(comps) if c[0] == scid), None)
                if ci is None:
                    raise ValueError("scan component not in frame")
                sel[ci] = (tabs >> 4, tabs & 0xF)
                scan_cis.append(ci)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            scan_start = pos + 2 + size
            end = _scan_end(payload, scan_start)
            r = _BitReader(payload[scan_start:end])
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan band must be [0,0] (B.2.3)")
                if len(scan_cis) > 1:
                    units = [
                        [
                            (ci, mcu_y * comps[ci][3] + vv, mcu_x * comps[ci][2] + hh)
                            for ci in scan_cis
                            for vv in range(comps[ci][3])
                            for hh in range(comps[ci][2])
                        ]
                        for mcu_y in range(my)
                        for mcu_x in range(mx)
                    ]
                else:
                    ci = scan_cis[0]
                    _, _, nbx, nby = geom[ci]
                    units = [[(ci, by, bx)] for by in range(nby) for bx in range(nbx)]
                _prog_scan_dc(r, units, huff, sel, coefs, ah, al, restart_interval)
            else:
                if len(scan_cis) != 1:
                    raise ValueError("AC scans must be non-interleaved (B.2.3)")
                if se > 63 or ss > se:
                    raise ValueError("illegal spectral band")
                ci = scan_cis[0]
                _, _, nbx, nby = geom[ci]
                blocks = [(by, bx) for by in range(nby) for bx in range(nbx)]
                _prog_scan_ac(
                    r, blocks, huff[(1, sel[ci][1])], coefs[ci], ss, se, ah, al, restart_interval
                )
            pos = end
            continue
        pos += 2 + size
    if not comps or width is None:
        raise ValueError("missing SOF2/SOS")
    C = _dct_matrix()
    inv = np.argsort(_ZIGZAG)
    planes = _planes_from_coefs(coefs, comps, qtables, C, inv)
    full = [
        np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)[:height, :width]
        for p, (_, _, h, v) in zip(planes, comps)
    ]
    ncomp = len(comps)
    pixels = full[0] if ncomp == 1 else np.stack(full, axis=-1)
    return {
        "width": int(width),
        "height": int(height),
        "pixels": pixels,
        "ncomp": ncomp,
        "sampling": [(h, v) for _, _, h, v in comps],
        "mcu_w": 8 * hmax,
        "progressive": True,
    }


# -------------------------------------------------------------- ISO BMFF
# MP4 container parsing with zero external libraries: generic box walk
# (32/64-bit sizes), sample tables (stts/stsc/stsz/stco|co64), absolute
# per-sample byte extraction. The video CODEC stays at the register_decoder
# seam (no ffmpeg in this container) — but the container plumbing, which is
# the part a Spark training-data pipeline actually owns (which bytes are
# frame k, how long is the clip, what codec tag to dispatch on), is real
# and oracle-gated. Reference analog: binary payloads flow opaque end to
# end (PipeCodec, msg_data).


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _mp4_full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _mp4_box(tag, bytes([version]) + flags.to_bytes(3, "big") + body)


_MP4_FTYP = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp42")
_MP4_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _mp4_stsc_runs(chunk_sample_counts: list[int]) -> list[tuple[int, int]]:
    """Run-length compress per-chunk sample counts into stsc entries
    (first_chunk, samples_per_chunk) — the format's own compression; a
    trailing short chunk yields a second run."""
    runs: list[tuple[int, int]] = []
    for i, c in enumerate(chunk_sample_counts, start=1):
        if not runs or runs[-1][1] != c:
            runs.append((i, c))
    return runs


def mp4_bytes(
    frames: list[bytes],
    width: int | None = None,
    height: int = 1,
    timescale: int = 1000,
    sample_delta: int = 40,
    fourcc: bytes = b"gry8",
    samples_per_chunk: int = 2,
    co64: bool = False,
    largesize_mdat: bool = False,
    version1: bool = False,
) -> bytes:
    """Minimal valid ISO BMFF (MP4) writer: ftyp + mdat (frame payloads) +
    moov carrying a full video sample table. Frames are grouped
    `samples_per_chunk` per chunk so a decoder's stsc/stco chunk walk is
    genuinely exercised (a trailing short chunk produces a second stsc run).
    `co64` writes 64-bit chunk offsets, `largesize_mdat` a size==1/u64 mdat
    header, `version1` v1 mvhd/mdhd/tkhd (64-bit times) — the corner shapes
    a real corpus contains."""
    n = len(frames)
    if width is None:
        width = len(frames[0]) if frames else 0
    duration = n * sample_delta

    mdat_hdr = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + sum(map(len, frames)))
        if largesize_mdat
        else struct.pack(">I", 8 + sum(map(len, frames))) + b"mdat"
    )
    data_base = len(_MP4_FTYP) + len(mdat_hdr)

    # chunking: offsets are absolute file positions of each chunk's first byte
    counts: list[int] = []
    left = n
    while left > 0:
        counts.append(min(samples_per_chunk, left))
        left -= counts[-1]
    offsets: list[int] = []
    pos, k = data_base, 0
    for c in counts:
        offsets.append(pos)
        pos += sum(len(frames[k + j]) for j in range(c))
        k += c

    if version1:
        mvhd = _mp4_full(
            b"mvhd", 1, 0,
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
            + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tk_time = struct.pack(">QQI", 0, 0, 1) + b"\x00" * 4 + struct.pack(">Q", duration)
        md_time = struct.pack(">QQIQ", 0, 0, timescale, duration)
        tk_ver = md_ver = 1
    else:
        mvhd = _mp4_full(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
            + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tk_time = struct.pack(">III", 0, 0, 1) + b"\x00" * 4 + struct.pack(">I", duration)
        md_time = struct.pack(">IIII", 0, 0, timescale, duration)
        tk_ver = md_ver = 0
    tkhd = _mp4_full(
        b"tkhd", tk_ver, 7,
        tk_time + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MP4_MATRIX + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _mp4_full(b"mdhd", md_ver, 0, md_time + struct.pack(">HH", 0x55C4, 0))
    hdlr = _mp4_full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"aq\x00")

    sample_entry = _mp4_box(
        fourcc,
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved, data_reference_index
        + b"\x00" * 16                       # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)  # reserved, frame_count
        + b"\x00" * 32                        # compressorname
        + struct.pack(">Hh", 24, -1),         # depth, pre_defined
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta) if n else struct.pack(">I", 0))
    runs = _mp4_stsc_runs(counts)
    stsc = _mp4_full(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, c, 1) for fc, c in runs),
    )
    sizes = [len(f) for f in frames]
    if n and len(set(sizes)) == 1 and sizes[0] > 0:
        # constant-size shortcut the spec provides: sample_size != 0, no
        # table (sample_size == 0 is reserved to mean "per-sample table")
        stsz = _mp4_full(b"stsz", 0, 0, struct.pack(">II", sizes[0], n))
    else:
        stsz = _mp4_full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
        )
    if co64:
        stco = _mp4_full(
            b"co64", 0, 0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        stco = _mp4_full(
            b"stco", 0, 0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _mp4_box(b"dinf", _mp4_full(b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b"")))
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return _MP4_FTYP + mdat_hdr + b"".join(frames) + moov


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (tag, body_start, box_end) for each box in [start, end) —
    handles size==1 (64-bit largesize) and size==0 (extends to end)."""
    off = start
    while off < end:
        if end - off < 8:
            raise ValueError("truncated MP4 box header")
        size = struct.unpack_from(">I", buf, off)[0]
        tag = buf[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if end - off < 16:
                raise ValueError("truncated MP4 largesize header")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"MP4 box {tag!r} overruns its container")
        yield tag, body, off + size
        off += size


def _mp4_child(buf: bytes, start: int, end: int, tag: bytes):
    for t, b, e in _mp4_boxes(buf, start, end):
        if t == tag:
            return b, e
    return None


def decode_mp4(payload: bytes) -> dict:
    """Parse an ISO BMFF (MP4) container in pure stdlib: box walk, first
    video track's sample tables, and absolute per-sample byte extraction via
    the stsc/stco chunk-mapping algorithm (ISO 14496-12 §8.7.4). Returns the
    container facts a pipeline dispatches on plus every sample's exact bytes;
    decoding those bytes is the registered codec's job. Fragmented files
    (moof) are refused loudly rather than half-read."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF stream (no ftyp)")
    moov = None
    for tag, b, e in _mp4_boxes(payload, 0, len(payload)):
        if tag == b"moof":
            raise ValueError("fragmented MP4 (moof) not supported; flatten first")
        if tag == b"moov":
            moov = (b, e)
    if moov is None:
        raise ValueError("no moov box (streaming-unfinalized MP4?)")

    # first track whose handler is video; else the first track at all
    chosen = None
    for tag, b, e in _mp4_boxes(payload, *moov):
        if tag != b"trak":
            continue
        mdia = _mp4_child(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_child(payload, *mdia, b"hdlr")
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1") if hdlr else ""
        if chosen is None or handler == "vide":
            chosen = ((b, e), mdia, handler)
        if handler == "vide":
            break
    if chosen is None:
        raise ValueError("moov contains no usable trak")
    (tb, te), (mb, me), handler = chosen

    tkhd = _mp4_child(payload, tb, te, b"tkhd")
    width = height = 0
    if tkhd:
        v = payload[tkhd[0]]
        # version/flags(4) + times+ids (v0 20 / v1 32) + reserved(8) +
        # layer/group/volume/reserved(8) + matrix(36) -> width/height 16.16
        fixed = tkhd[0] + (76 if v == 0 else 88)
        width = struct.unpack_from(">I", payload, fixed)[0] >> 16
        height = struct.unpack_from(">I", payload, fixed + 4)[0] >> 16

    mdhd = _mp4_child(payload, mb, me, b"mdhd")
    if mdhd is None:
        raise ValueError("trak has no mdhd")
    v = payload[mdhd[0]]
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, mdhd[0] + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", payload, mdhd[0] + 4 + 8)

    minf = _mp4_child(payload, mb, me, b"minf")
    stbl = _mp4_child(payload, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("trak has no sample table (stbl)")

    stsd = _mp4_child(payload, *stbl, b"stsd")
    fourcc, sd_w, sd_h = "", 0, 0
    if stsd and struct.unpack_from(">I", payload, stsd[0] + 4)[0] >= 1:
        eb = stsd[0] + 8  # first sample entry: size+fourcc then VisualSampleEntry
        fourcc = payload[eb + 4 : eb + 8].decode("latin1")
        sd_w, sd_h = struct.unpack_from(">HH", payload, eb + 8 + 6 + 2 + 16)

    stts = _mp4_child(payload, *stbl, b"stts")
    n_from_stts, dur_from_stts = 0, 0
    if stts:
        (cnt,) = struct.unpack_from(">I", payload, stts[0] + 4)
        for i in range(cnt):
            c, d = struct.unpack_from(">II", payload, stts[0] + 8 + 8 * i)
            n_from_stts += c
            dur_from_stts += c * d

    stsz = _mp4_child(payload, *stbl, b"stsz")
    if stsz is None:
        raise ValueError("stbl has no stsz")
    const_size, n_samples = struct.unpack_from(">II", payload, stsz[0] + 4)
    sizes = (
        [const_size] * n_samples
        if const_size
        else list(struct.unpack_from(f">{n_samples}I", payload, stsz[0] + 12))
    )

    stco = _mp4_child(payload, *stbl, b"stco")
    if stco:
        (nch,) = struct.unpack_from(">I", payload, stco[0] + 4)
        chunk_offsets = list(struct.unpack_from(f">{nch}I", payload, stco[0] + 8))
    else:
        co64 = _mp4_child(payload, *stbl, b"co64")
        if co64 is None:
            raise ValueError("stbl has neither stco nor co64")
        (nch,) = struct.unpack_from(">I", payload, co64[0] + 4)
        chunk_offsets = list(struct.unpack_from(f">{nch}Q", payload, co64[0] + 8))

    stsc = _mp4_child(payload, *stbl, b"stsc")
    if stsc is None:
        raise ValueError("stbl has no stsc")
    (nruns,) = struct.unpack_from(">I", payload, stsc[0] + 4)
    runs = [
        struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)[:2]
        for i in range(nruns)
    ]

    # ISO 14496-12 §8.7.4: each stsc run covers chunks [first_chunk, next
    # run's first_chunk); samples are laid out contiguously within a chunk
    samples: list[bytes] = []
    si = 0
    for ri, (first, per) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunk_offsets)
        for ch in range(first, last + 1):
            pos = chunk_offsets[ch - 1]
            for _ in range(per):
                if si >= n_samples:
                    break
                samples.append(bytes(payload[pos : pos + sizes[si]]))
                if len(samples[-1]) != sizes[si]:
                    raise ValueError(f"sample {si} overruns the file")
                pos += sizes[si]
                si += 1
    if si != n_samples:
        raise ValueError(f"chunk map yields {si} samples, stsz declares {n_samples}")
    if n_from_stts and n_from_stts != n_samples:
        raise ValueError(f"stts declares {n_from_stts} samples, stsz {n_samples}")

    return {
        "width": int(width or sd_w),
        "height": int(height or sd_h),
        "fourcc": fourcc,
        "handler": handler,
        "timescale": int(timescale),
        "duration": int(duration or dur_from_stts),
        "duration_ms": int((duration or dur_from_stts) * 1000 // max(timescale, 1)),
        "n_samples": int(n_samples),
        "n_chunks": len(chunk_offsets),
        "samples": samples,
    }


# ----------------------------------------------------------- MPEG audio
# MP3 frame-level parsing with zero external libraries: ID3v2/ID3v1 tag
# skipping, the 4-byte frame-header field split, the spec's bitrate /
# sample-rate tables for all three MPEG versions x three layers, the exact
# frame-length arithmetic (Layer I slot-of-4 rule; Layer III's 72-factor for
# MPEG-2/2.5), optional CRC-16 slot, and free-format (bitrate index 0) frame
# sizing by same-header sync scan. The Huffman AUDIO codec stays at the
# register_decoder seam — the frame walk, which is the part a training-data
# pipeline owns (how many frames, which bytes are frame k, what duration to
# account), is real and oracle-gated. Reference analog: binary payloads flow
# opaque end to end (PipeCodec, msg_data).

# bitrate tables in kbps, index 1..14 (0 = free format, 15 = reserved)
_MP3_BITRATES = {
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000], "2.5": [11025, 12000, 8000]}
_MP3_VER_BITS = {"2.5": 0, "2": 2, "1": 3}
_MP3_LAYER_BITS = {1: 3, 2: 2, 3: 1}


def _mp3_samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576  # Layer III halves for MPEG-2/2.5


def mp3_frame_len(version: str, layer: int, bitrate_idx: int, sr_idx: int, padding: int) -> int:
    """Exact frame length in bytes from the header fields (tabled bitrates).
    Layer I counts 4-byte slots; Layers II/III count byte slots; Layer III
    under MPEG-2/2.5 uses the 72 factor (576 samples/frame)."""
    br = _MP3_BITRATES[(version if version == "1" else "2", layer)][bitrate_idx - 1] * 1000
    sr = _MP3_RATES[version][sr_idx]
    if layer == 1:
        return (12 * br // sr + padding) * 4
    factor = 72 if (layer == 3 and version != "1") else 144
    return factor * br // sr + padding


def _mp3_header(
    version: str, layer: int, bitrate_idx: int, sr_idx: int,
    padding: int = 0, channel_mode: int = 3, crc: bool = False,
) -> bytes:
    hdr = (
        (0x7FF << 21)
        | (_MP3_VER_BITS[version] << 19)
        | (_MP3_LAYER_BITS[layer] << 17)
        | ((0 if crc else 1) << 16)
        | (bitrate_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
        | (channel_mode << 6)
    )
    return struct.pack(">I", hdr)


def mp3_frame_bytes(
    payload: bytes, version: str = "1", layer: int = 3, bitrate_idx: int = 9,
    sr_idx: int = 0, padding: int = 0, channel_mode: int = 3, crc: bool = False,
) -> bytes:
    """One spec-exact MPEG audio frame with a tabled bitrate: the payload must
    fill the frame's data slot exactly (frame_len - 4 header - 2 if CRC)."""
    flen = mp3_frame_len(version, layer, bitrate_idx, sr_idx, padding)
    cap = flen - 4 - (2 if crc else 0)
    if len(payload) != cap:
        raise ValueError(f"payload must be exactly {cap} bytes for this header, got {len(payload)}")
    head = _mp3_header(version, layer, bitrate_idx, sr_idx, padding, channel_mode, crc)
    body = (b"\x00\x00" if crc else b"") + payload  # CRC value itself is codec-checked, not ours
    return head + body


def mp3_free_bytes(
    frames: list[bytes], version: str = "1", layer: int = 3, sr_idx: int = 2,
    channel_mode: int = 3,
) -> bytes:
    """Free-format (bitrate index 0) MPEG audio stream: every frame carries
    the same header and an arbitrary-but-constant data size; decoders size
    the frames by scanning to the next sync (ISO 11172-3 allows exactly
    this). Frame payloads must not contain 0xFF bytes (valid UTF-8 never
    does), which the writer enforces."""
    head = _mp3_header(version, layer, 0, sr_idx, 0, channel_mode)
    for f in frames:
        if b"\xff" in f:
            raise ValueError("free-format frame payloads must not contain 0xFF (false sync)")
    return b"".join(head + f for f in frames)


def id3v2_bytes(fields: dict[str, str]) -> bytes:
    """Minimal structurally-valid ID3v2.3 tag (the metadata prefix real MP3
    corpora carry): per-field frames with 4-byte ids, big-endian sizes, and a
    syncsafe total length in the 10-byte header."""
    body = b""
    for fid, text in fields.items():
        data = b"\x00" + text.encode("latin1")  # encoding byte 0 = ISO-8859-1
        body += fid.encode("ascii")[:4].ljust(4, b"X") + struct.pack(">I", len(data)) + b"\x00\x00" + data
    n = len(body)
    syncsafe = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3\x03\x00\x00" + syncsafe + body


_ID3V1_STUB = b"TAG" + b"\x00" * 125


def decode_mp3(payload: bytes) -> dict:
    """MPEG audio (MP3 family) frame walk in pure stdlib: skip ID3v2 (syncsafe
    size + optional footer) and a trailing ID3v1 block, then iterate frames —
    header field split, tabled or free-format sizing, CRC slot skip — and
    slice every frame's exact data bytes. Mixed-bitrate (VBR) streams are
    walked per-frame; version/layer/sample-rate changes mid-stream are
    refused loudly (corrupt stream, not a feature)."""
    pos, has_id3v2 = 0, False
    if payload[:3] == b"ID3" and len(payload) >= 10:
        has_id3v2 = True
        flags = payload[5]
        size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        pos = 10 + size + (10 if flags & 0x10 else 0)
    end, has_id3v1 = len(payload), False
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        has_id3v1, end = True, end - 128

    frames: list[bytes] = []
    bitrates: list[int] = []
    stream_key = None  # (version, layer, sr_idx, crc) must stay constant
    free_size = None
    version, layer, sr_idx, channel_mode, crc = "", 0, 0, 3, False
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"truncated MPEG frame header at byte {pos}")
        (hdr,) = struct.unpack_from(">I", payload, pos)
        if (hdr >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost frame sync at byte {pos}")
        ver_bits = (hdr >> 19) & 3
        layer_bits = (hdr >> 17) & 3
        if ver_bits == 1 or layer_bits == 0:
            raise ValueError("reserved MPEG version/layer bits")
        version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
        layer = {3: 1, 2: 2, 1: 3}[layer_bits]
        crc = (hdr >> 16) & 1 == 0
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 3
        pad = (hdr >> 9) & 1
        channel_mode = (hdr >> 6) & 3
        if br_idx == 15 or sr_idx == 3:
            raise ValueError("reserved bitrate/sample-rate index")
        key = (version, layer, sr_idx, crc)
        if stream_key is None:
            stream_key = key
        elif key != stream_key:
            raise ValueError(f"frame {len(frames)} changes version/layer/rate mid-stream")
        if br_idx == 0:  # free format: constant frame size, found by sync scan
            if free_size is None:
                nxt = payload.find(payload[pos : pos + 4], pos + 4, end)
                free_size = (nxt - pos) if nxt != -1 else (end - pos)
            flen = min(free_size, end - pos)
            bitrates.append(0)
        else:
            flen = mp3_frame_len(version, layer, br_idx, sr_idx, pad)
            bitrates.append(_MP3_BITRATES[(version if version == "1" else "2", layer)][br_idx - 1])
        if pos + flen > end:
            raise ValueError(f"frame {len(frames)} overruns the stream")
        data_start = pos + 4 + (2 if crc else 0)
        frames.append(bytes(payload[data_start : pos + flen]))
        pos += flen
    if not frames:
        raise ValueError("no MPEG audio frames")

    spf = _mp3_samples_per_frame(version, layer)
    sample_rate = _MP3_RATES[version][sr_idx]
    tabled = [b for b in bitrates if b]
    return {
        "version": version,
        "layer": layer,
        "sample_rate": sample_rate,
        "channels": 1 if channel_mode == 3 else 2,
        "samples_per_frame": spf,
        "n_frames": len(frames),
        "n_samples": spf * len(frames),
        "duration_ms": spf * len(frames) * 1000 // sample_rate,
        "bitrate_kbps": tabled[0] if tabled and len(set(tabled)) == 1 else 0,
        "vbr": len(set(bitrates)) > 1,
        "free_format": 0 in bitrates,
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
        "frames": frames,
    }


def _audio_features_real(payload: bytes, dim: int) -> np.ndarray:
    """Real audio features from a WAV payload: [sample_rate, channels, bits,
    n_samples, duration_ms] + per-chunk RMS energy filling the remaining dims.
    MP3 payloads (ID3 prefix or frame sync) take the frame walk instead: bits
    slot carries the layer, chunk energies the per-frame byte means (the
    registry-seam stand-in for the Huffman codec)."""
    if payload[:3] == b"ID3" or (len(payload) >= 2 and payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0):
        mp3 = decode_mp3(payload)
        head = [
            float(mp3["sample_rate"]),
            float(mp3["channels"]),
            float(mp3["layer"]),
            float(mp3["n_samples"]),
            float(mp3["duration_ms"]),
        ]
        k = max(dim - len(head), 0)
        means = [
            float(np.frombuffer(f, dtype=np.uint8).mean()) if f else 0.0
            for f in mp3["frames"][:k]
        ]
        tail = means + [0.0] * (k - len(means))
        return np.asarray((head + tail)[:dim], dtype=np.float32)
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
    elif payload[: len(_PNG_SIG)] == _PNG_SIG:
        img = dict(decode_png(payload))
        if img["pixels"].ndim == 2:
            img["pixels"] = np.repeat(img["pixels"][:, :, None], 3, axis=2)  # gray->RGB
    elif payload[:2] == b"\xff\xd8":
        img = dict(decode_jpeg(payload))
        if img["pixels"].ndim == 2:
            img["pixels"] = np.repeat(img["pixels"][:, :, None], 3, axis=2)  # gray->RGB
    else:
        raise ValueError("unsupported image container (PPM/BMP/PNG/DCT-JPEG only without codec libs)")
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


def _video_features_real(payload: bytes, dim: int) -> np.ndarray:
    """Real video features from an animated-GIF or MP4 payload (sniffed by
    magic): [width, height, n_frames, first-frame mean, last-frame mean] +
    per-frame gray means filling the remaining dims (zero-padded past the
    frame count). For MP4 the per-frame bytes come from the real sample-table
    walk; interpreting them as gray values is the registry-seam stand-in for
    the codec."""
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        mp4 = decode_mp4(payload)
        frames = [np.frombuffer(s, dtype=np.uint8).astype(np.float64) for s in mp4["samples"]]
        w, h, n = mp4["width"], mp4["height"], mp4["n_samples"]
        means = [float(f.mean()) if f.size else 0.0 for f in frames]
    else:
        gif = decode_gif(payload)
        fr = gif["frames"].astype(np.float64)
        w, h, n = gif["width"], gif["height"], gif["n_frames"]
        means = [float(fr[i].mean()) for i in range(len(fr))] if fr.size else []
    head = [
        float(w),
        float(h),
        float(n),
        means[0] if means else 0.0,
        means[-1] if means else 0.0,
    ]
    k = max(dim - len(head), 0)
    tail = means[:k] + [0.0] * max(k - len(means), 0)
    return np.asarray((head + tail)[:dim], dtype=np.float32)


#: kinds decodable with zero external libraries — the built-in real path.
_BUILTIN_REAL_DECODERS = {
    "audio": _audio_features_real,
    "image": _image_features_real,
    "video": _video_features_real,
}


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
            # Kinds needing real codec libraries (mp3/mp4: ffmpeg) are not
            # decodable in this container. register_decoder() plugs them in
            # on a cluster; audio/image/video fall back to the built-in
            # pure-numpy WAV/PPM/BMP/PNG/JPEG/GIF parsers above.
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


def gif_frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: decode each animated-GIF payload's actual
    frame sequence (LZW + compositing, decode_gif) and keep every n-th
    frame's full-canvas gray plane. Same 1 row -> k rows fan-out as the
    frame_sample stub, but the frames come from a genuine container decode —
    an ffmpeg keyframe iterator drops in by replacing one function."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_bytes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                if payload[:6] not in (b"GIF87a", b"GIF89a"):
                    continue
                gif = decode_gif(payload)
                for idx in range(0, gif["n_frames"], every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_bytes.append(gif["frames"][idx].tobytes())
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def mp4_frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling from MP4 containers: walk each payload's
    sample tables (stts/stsc/stsz/stco) and keep every n-th sample's exact
    bytes — the keyframe-extraction shape (1 media row -> k frame rows)
    driven by the container's own index, no codec needed to SELECT frames.
    Decoding the kept bytes is the registered codec's job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_bytes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                if len(payload) < 8 or payload[4:8] != b"ftyp":
                    continue
                mp4 = decode_mp4(payload)
                for idx in range(0, mp4["n_samples"], every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_bytes.append(mp4["samples"][idx])
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


def jpeg_media_from_documents(docs: DataFrame, limit: int | None = None) -> DataFrame:
    """Media table of REAL baseline JPEGs built from the documents table: each
    doc's UTF-8 text bytes become the per-block values of a one-block-row
    grayscale JPEG (jpeg_bytes). The payloads are genuine SOF0 JPEG streams —
    standard Huffman tables, real entropy-coded scan — any baseline decoder
    reads them; the constant-block + unit-quantizer layout is what makes the
    decode EXACTLY invertible, so md5 of the recovered block bytes must equal
    md5(text) (SQL-expressible oracle, like the WAV/PPM builders)."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": [
                        jpeg_bytes((t or "").encode("utf-8")) for t in pdf["text"]
                    ],
                    "meta": [{"container": "jpeg", "codec": "baseline"}] * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def jpeg_color_media_from_documents(
    docs: DataFrame, limit: int | None = None, restart_interval: int = 4
) -> DataFrame:
    """Media table of 3-component (YCbCr 4:4:4) baseline JPEGs WITH restart
    intervals, built from the documents table: each doc's UTF-8 text bytes
    become the Y plane of an interleaved one-MCU-row stream (Cb/Cr are fixed
    derivations of Y — see jpeg_color_bytes), with an RSTn marker every
    `restart_interval` MCUs. Decoding these exercises interleaved MCU order,
    three diverging DC predictor chains, restart sequence checking and
    predictor reset — and still md5-round-trips the source text exactly."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": [
                        jpeg_color_bytes(
                            (t or "").encode("utf-8"),
                            restart_interval=restart_interval,
                        )
                        for t in pdf["text"]
                    ],
                    "meta": [
                        {"container": "jpeg", "codec": "baseline-ycbcr444-dri"}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def jpeg420_media_from_documents(
    docs: DataFrame, limit: int | None = None, restart_interval: int = 4
) -> DataFrame:
    """Media table of chroma-subsampled (YCbCr 4:2:0) baseline JPEGs with
    restart intervals — the sampling layout real camera/web encoders emit:
    each doc's UTF-8 text bytes become one 16x16 MCU each (four distinct
    constant luma blocks + quarter-res Cb/Cr — see jpeg420_bytes), with an
    RSTn marker every `restart_interval` MCUs. Decoding these exercises the
    general per-component MCU geometry (Y00 Y01 Y10 Y11 Cb Cr data-unit
    order), chroma upsampling, and MCU-counted restarts — and still
    md5-round-trips the source text exactly off the decoded Y plane."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": [
                        jpeg420_bytes(
                            (t or "").encode("utf-8"),
                            restart_interval=restart_interval,
                        )
                        for t in pdf["text"]
                    ],
                    "meta": [
                        {"container": "jpeg", "codec": "baseline-ycbcr420-dri"}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def jpeg_progressive_media_from_documents(
    docs: DataFrame, limit: int | None = None, restart_interval: int = 3
) -> DataFrame:
    """Media table of progressive (SOF2) JPEGs built from the documents
    table: each doc's UTF-8 text bytes become the constant blocks of a
    one-block-row grayscale stream rendered across SIX scans — DC at Al=1,
    a DC refinement bit plane, then AC first + refinement scans (shared
    EOBRUN streams) — with RSTn markers every `restart_interval` units in
    every scan. Decoding walks the real multi-scan successive-approximation
    machinery and still md5-round-trips the source text exactly."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": [
                        jpeg_progressive_bytes(
                            (t or "").encode("utf-8"),
                            restart_interval=restart_interval,
                        )
                        for t in pdf["text"]
                    ],
                    "meta": [
                        {"container": "jpeg", "codec": "progressive-sa-dri"}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def png_media_from_documents(
    docs: DataFrame, limit: int | None = None, height: int = 5, interlace: int = 0
) -> DataFrame:
    """Media table of REAL PNGs built from the documents table: each doc's
    UTF-8 text bytes become `height` identical scanlines (width = byte
    count), written through the cycling-filter encoder so every scanline
    predictor (None/Sub/Up/Average/Paeth) appears in every payload. The
    color type rotates by doc_id — grayscale (0), truecolor (2, R=G=B),
    indexed (3, identity palette) — so one oracle entry gates all three
    pixel layouts; interlace=1 writes Adam7 streams. The recovered plane is
    exactly `height` copies of the text bytes (oracle: md5(repeat(text, h)))."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)
    ctypes = (0, 2, 3)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": [
                        png_bytes(
                            (t or "").encode("utf-8"),
                            height=height,
                            color_type=ctypes[int(did) % 3],
                            interlace=interlace,
                        )
                        for did, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "meta": [
                        {"container": "png", "codec": "adam7" if interlace else "sequential"}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def gif_media_from_documents(
    docs: DataFrame,
    limit: int | None = None,
    height: int = 4,
    n_frames: int = 3,
    interlace_alt: bool = True,
) -> DataFrame:
    """Media table of REAL animated GIFs built from the documents table: each
    doc's UTF-8 text bytes become `height` identical rows repeated across
    `n_frames` full-canvas frames (width = byte count; identity grayscale
    palette, so palette index == source byte). With `interlace_alt` odd
    frames are row-interlaced, so one payload exercises both row orders plus
    the LZW coder's width growth and (on long docs) its 4096-entry reset.
    kind is "video" — this is the repo's genuine animation container. The
    recovered frame stack is exactly height*n_frames copies of the text
    bytes (oracle: md5(repeat(text, height*n_frames)))."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["video"] * len(pdf),
                    "payload": [
                        gif_bytes(
                            (t or "").encode("utf-8"),
                            height=height,
                            n_frames=n_frames,
                            interlace_alt=interlace_alt,
                        )
                        for t in pdf["text"]
                    ],
                    "meta": [
                        {"container": "gif", "codec": "lzw", "frames": str(n_frames)}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def mp4_media_from_documents(
    docs: DataFrame,
    limit: int | None = None,
    n_frames: int = 3,
    sample_delta: int = 40,
    timescale: int = 1000,
) -> DataFrame:
    """Media table of REAL MP4 containers built from the documents table:
    each doc's UTF-8 text bytes become every frame's payload (width = byte
    count, height 1), chunked 2 samples per chunk so the decode summary's
    digest can only match if the stsc/stco chunk walk recovers every sample
    from its absolute file offset (with 3 frames the trailing short chunk
    also forces a second stsc run). Identical frames take the constant-size
    stsz shortcut. Oracle: md5(repeat(text, n_frames)); duration =
    n_frames * sample_delta ms at the default 1 kHz timescale."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["video"] * len(pdf),
                    "payload": [
                        mp4_bytes(
                            [(t or "").encode("utf-8")] * n_frames,
                            sample_delta=sample_delta,
                            timescale=timescale,
                        )
                        for t in pdf["text"]
                    ],
                    "meta": [
                        {"container": "mp4", "codec": "gry8", "frames": str(n_frames)}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def mp3_media_from_documents(
    docs: DataFrame,
    limit: int | None = None,
    n_frames: int = 3,
    sr_idx: int = 2,
) -> DataFrame:
    """Media table of REAL MPEG audio streams built from the documents table:
    an ID3v2.3 tag (title = doc id), then `n_frames` free-format MPEG-1
    Layer III frames whose data bytes each ARE the text, then an ID3v1
    trailer — so the decode summary's digest can only match if tag skipping,
    the header field split, and the free-format sync-scan sizing all recover
    every frame's exact bytes. Oracle: md5(repeat(text, n_frames)); at the
    default 32 kHz (sr_idx 2) duration = n_frames * 1152 / 32000 s, exactly
    108 ms for 3 frames."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["audio"] * len(pdf),
                    "payload": [
                        id3v2_bytes({"TIT2": f"doc {did}"})
                        + mp3_free_bytes([(t or "").encode("utf-8")] * n_frames, sr_idx=sr_idx)
                        + _ID3V1_STUB
                        for did, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "meta": [
                        {"container": "mp3", "codec": "mp3-free", "frames": str(n_frames)}
                    ]
                    * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def g711_media_from_documents(
    docs: DataFrame, limit: int | None = None, law: str = "alaw"
) -> DataFrame:
    """Media table of REAL G.711 telephony WAVs built from the documents
    table: each doc's UTF-8 text bytes ARE the companded code stream (format
    tag 6, 8 kHz mono — the PSTN container shape). The decode summary
    expands codes to linear int16 and re-compresses; A-law is injective over
    all 256 codes, so the digest equals md5(text) only if BOTH G.711
    directions are exact (mu-law is also implemented but its +0/-0 pair
    collapses by design, so the oracle rides A-law)."""
    src = docs.select("doc_id", "text")
    if limit is not None:
        src = src.filter(F.col("doc_id") < limit)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["audio"] * len(pdf),
                    "payload": [
                        wav_g711_bytes((t or "").encode("utf-8"), law=law)
                        for t in pdf["text"]
                    ],
                    "meta": [{"container": "wav", "codec": law}] * len(pdf),
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def decode_real_summary(media: DataFrame) -> DataFrame:
    """REAL-decode summary — the oracle-gated proof that `use_real` decoding
    round-trips: each payload is container-sniffed by magic (RIFF -> WAV,
    P6 -> PPM, FFD8 -> baseline JPEG) and decoded by the pure-numpy parsers,
    then the DECODED samples/pixels are re-serialized and md5'd. The digest
    equals md5 of the source text bytes only if chunk walking, header parsing
    and sample/pixel extraction — for JPEG the whole Huffman/zigzag/
    dequantize/IDCT pipeline — are all correct."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in REAL_SUMMARY_SCHEMA.fields}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload or b"")
                if payload[:4] == b"RIFF":
                    wav = decode_wav(payload)
                    if wav.get("codec") in ("ulaw", "alaw"):
                        # companded stream: the digest gates BOTH directions —
                        # expand to linear int16, then the compressor must
                        # find its way back to the exact source codes
                        content = g711_compress(wav["samples"], wav["codec"])
                    else:
                        content = wav["samples"].tobytes()
                    rows["n_units"].append(wav["n_samples"])
                    rows["rate"].append(int(wav["sample_rate"]))
                    rows["duration_ms"].append(
                        wav["n_samples"] * 1000 // wav["sample_rate"]
                    )
                elif payload[: len(_PNG_SIG)] == _PNG_SIG:
                    img = decode_png(payload)
                    # the builders write `height` identical rows of the
                    # source bytes, so the md5 covers EVERY row — each row
                    # travels through a different scanline predictor (the
                    # encoder cycles all five), and under Adam7 through a
                    # different pass split as well
                    px = img["pixels"]
                    content = (px[..., 0] if px.ndim == 3 else px).tobytes()
                    rows["n_units"].append(img["width"])
                    rows["rate"].append(int(img["width"]))
                    rows["duration_ms"].append(int(img["height"]))
                elif len(payload) >= 8 and payload[4:8] == b"ftyp":
                    mp4 = decode_mp4(payload)
                    # the builder writes identical frame payloads chunked
                    # 2-per-chunk, so the md5 covers every sample sliced via
                    # the real stsc/stco chunk walk from absolute offsets
                    content = b"".join(mp4["samples"])
                    rows["n_units"].append(mp4["width"])
                    rows["rate"].append(int(mp4["n_samples"]))
                    rows["duration_ms"].append(int(mp4["duration_ms"]))
                elif payload[:6] in (b"GIF87a", b"GIF89a"):
                    gif = decode_gif(payload)
                    # the builder writes identical full-canvas frames under
                    # disposal 1, so the md5 covers EVERY frame's composited
                    # canvas — interlaced and sequential frames alike travel
                    # through LZW decode + de-interlace + compositing
                    content = gif["frames"].tobytes()
                    rows["n_units"].append(gif["width"])
                    rows["rate"].append(int(gif["n_frames"]))
                    rows["duration_ms"].append(int(gif["height"]))
                elif payload[:3] == b"ID3" or (
                    len(payload) >= 2 and payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0
                ):
                    mp3 = decode_mp3(payload)
                    # the builder writes identical free-format frame payloads
                    # between ID3v2/ID3v1 tags, so the md5 covers every
                    # frame's bytes sized by the real sync scan
                    content = b"".join(mp3["frames"])
                    rows["n_units"].append(len(mp3["frames"][0]))
                    rows["rate"].append(int(mp3["sample_rate"]))
                    rows["duration_ms"].append(int(mp3["duration_ms"]))
                elif payload[:2] == b"\xff\xd8":
                    img = decode_jpeg(payload)
                    # one byte per MCU (the builders' layout): top-left pixel
                    # of each MCU across the single MCU row — stride = the
                    # parsed MCU width (8 for 4:4:4, 16 for 4:2:0); for a
                    # color stream the Y plane carries the source bytes (the
                    # chroma planes and sibling luma blocks are its fixed
                    # derivations — pinned by pytest, not by this digest)
                    px = img["pixels"]
                    step = int(img.get("mcu_w", 8))
                    content = (px[..., 0] if px.ndim == 3 else px)[0, ::step].tobytes()
                    rows["n_units"].append(img["width"] // step)
                    rows["rate"].append(int(img["width"]))
                    rows["duration_ms"].append(int(img["height"]))
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
