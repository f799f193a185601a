"""Real PNG codec — stdlib zlib + numpy, no external imaging library.

PNG (RFC 2083 / W3C spec) is zlib-compressed filtered scanlines inside CRC'd
chunks; the 8-bit, non-interlaced subset decodes with ~150 lines of numpy.
This replaces the round-2 ``DETERMINISTIC_FAKE`` codec for image payloads:
the multimodal decode stage now performs a REAL spec-conforming decode
(signature + IHDR parse, zlib inflate, all five filter types unfiltered) for
8-bit grayscale / RGB / RGBA non-interlaced images, which covers everything
this engine's synthesis and tests produce.  Unsupported PNGs (16-bit,
palette, interlaced) raise ``UnsupportedPNG`` — loudly, never silently
wrong.

Encode writes filter-0/1/2 scanlines (selectable), so decode's unfiltering
paths are exercised by round-trip tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


class UnsupportedPNG(ValueError):
    pass


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """8-bit PNG from an (H, W) grayscale or (H, W, C) C∈{1,3,4} array.

    ``filter_type`` 0 (None), 1 (Sub) or 2 (Up) applies to every scanline —
    enough to exercise the decoder's unfiltering without an optimizer."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 pixels")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    if filter_type not in (0, 1, 2):
        raise ValueError("filter_type must be 0, 1 or 2")
    raw = img.reshape(h, w * c).astype(np.uint8)
    if filter_type == 0:
        filtered = raw
    elif filter_type == 1:  # Sub: delta vs previous pixel in the line
        prev = np.zeros_like(raw)
        prev[:, c:] = raw[:, :-c]
        filtered = (raw.astype(np.int16) - prev).astype(np.uint8)
    else:  # Up: delta vs the line above
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        filtered = (raw.astype(np.int16) - up).astype(np.uint8)
    lines = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), filtered], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """(H, W, C) uint8 array from an 8-bit non-interlaced PNG (all five
    scanline filters supported).  MALFORMED data of any kind raises
    :class:`UnsupportedPNG` — truncated chunks (struct.error), corrupt IDAT
    (zlib.error) and size mismatches all land on the same loud, catchable
    boundary so batch stages can fall back per row instead of dying."""
    try:
        return _decode_png_inner(data)
    except UnsupportedPNG:
        raise
    except (struct.error, zlib.error, ValueError, IndexError) as e:
        raise UnsupportedPNG(f"malformed PNG: {e}") from e


def _decode_png_inner(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise UnsupportedPNG("bad PNG signature")
    pos = 8
    width = height = None
    color = bit_depth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise UnsupportedPNG("missing IHDR")
    if bit_depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
        raise UnsupportedPNG(
            f"unsupported PNG variant (bit_depth={bit_depth}, color={color}, "
            f"interlace={interlace}) — 8-bit non-interlaced gray/RGB/RGBA only"
        )
    c = _COLOR_CHANNELS[color]
    stride = width * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise UnsupportedPNG("IDAT length mismatch")
    raw = raw.reshape(height, stride + 1)
    ftypes = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f = int(ftypes[y])
        cur = lines[y].copy()
        prior = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — per-channel prefix sum mod 256 (vectorized)
            out[y] = (
                np.cumsum(cur.reshape(width, c), axis=0, dtype=np.int64) & 0xFF
            ).reshape(stride)
        elif f == 2:  # Up
            out[y] = (cur + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = cur[x - c] if x >= c else 0
                cur[x] = (cur[x] + ((left + prior[x]) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                b = prior[x]
                cc = prior[x - c] if x >= c else 0
                p = a + b - cc
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise UnsupportedPNG(f"unknown filter type {f}")
    return out.astype(np.uint8).reshape(height, width, c)


def png_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR alone — no inflate."""
    if data[:8] != PNG_SIG:
        raise UnsupportedPNG("bad PNG signature")
    (length,) = struct.unpack(">I", data[8:12])
    if data[12:16] != b"IHDR":
        raise UnsupportedPNG("IHDR not first chunk")
    width, height, bit_depth, color, _c, _f, interlace = struct.unpack(
        ">IIBBBBB", data[16 : 16 + length]
    )
    if bit_depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
        raise UnsupportedPNG("unsupported PNG variant")
    return width, height, _COLOR_CHANNELS[color]
