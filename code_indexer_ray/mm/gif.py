"""Real GIF codec — pure python/numpy LZW, no external imaging library.

GIF (the public GIF89a specification) stores palette indices compressed
with variable-code-width LZW inside 255-byte sub-blocks.  Decode implements
full LZW: clear/EOI codes, code width growth 3→12 bits, and the KwKwK
(code == next unassigned entry) case, then maps indices through the
global/local color table to RGB.  Supported: GIF87a/89a, single image,
non-interlaced, any palette size; extensions are skipped.  Interlaced
images or a missing color table raise ``UnsupportedGIF`` — loudly, never
silently wrong.

Encode writes a spec-conforming stream using the classic uncompressed-GIF
technique: literal index codes at a fixed width with a Clear code emitted
before the decoder's table would force a width increase.  Round-trip tests
therefore exercise decode's clear handling; the test suite also feeds
decode a REAL compressing LZW stream (independent compressor implemented
from the spec in the tests) so the table-growth and KwKwK paths are
exercised by bytes our encoder never produces.

Reference provenance: the reference hands media to external libraries;
this codec exists so the Ray decode stage operates on real bytes for a
palette-based container format (see `mm/decode.py`).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIG = b"GIF8"


class UnsupportedGIF(ValueError):
    pass


def _pack_codes(codes: list[int], widths: list[int]) -> bytes:
    """LSB-first bit packing of (code, bit-width) pairs."""
    out = bytearray()
    acc = 0
    nbits = 0
    for code, w in zip(codes, widths):
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """GIF89a from an (H, W) uint8 index array (default palette =
    256-entry grayscale, so index == luminance)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gif expects a 2-D uint8 index array")
    h, w = img.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    min_code_size = 8
    clear = 1 << min_code_size          # 256
    eoi = clear + 1                      # 257
    # uncompressed technique: every code is a literal; the decoder still
    # adds a table entry per code, so emit Clear before the width would grow
    codes = [clear]
    widths = [min_code_size + 1]
    table_next = eoi + 1
    for v in img.reshape(-1).tolist():
        if table_next >= (1 << (min_code_size + 1)) - 1:
            codes.append(clear)
            widths.append(min_code_size + 1)
            table_next = eoi + 1
        codes.append(v)
        widths.append(min_code_size + 1)
        table_next += 1
    codes.append(eoi)
    widths.append(min_code_size + 1)
    stream = _pack_codes(codes, widths)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT present, 256 entries
    out += palette.astype(np.uint8).tobytes()
    out += b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor, no LCT
    out.append(min_code_size)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out += b";"
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Full variable-width LZW decode → uint8 index array."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    total = len(bits)

    def reset_table() -> tuple[list[bytes], int, int]:
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset_table()
    out = bytearray()
    prev: bytes | None = None
    while pos + width <= total and len(out) < n_pixels:
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code < next_code:
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
                next_code += 1
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
            next_code += 1
        else:
            raise UnsupportedGIF(f"corrupt LZW stream (code {code} > table {next_code})")
        out += entry
        prev = entry
        if next_code >= (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise UnsupportedGIF(f"LZW stream ended early ({len(out)} < {n_pixels} pixels)")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) RGB uint8 array (first image in the stream)."""
    if data[:4] != GIF_SIG or data[4:6] not in (b"7a", b"9a") or len(data) < 13:
        raise UnsupportedGIF("not a GIF payload")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(data) < pos + n * 3:
            raise UnsupportedGIF("truncated global color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        marker = data[pos]
        pos += 1
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if iflags & 0x40:
                raise UnsupportedGIF("interlaced GIF unsupported")
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if len(data) < pos + n * 3:
                    raise UnsupportedGIF("truncated local color table")
                pal = np.frombuffer(
                    data, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise UnsupportedGIF("no color table")
            min_code_size = data[pos]
            pos += 1
            if not 2 <= min_code_size <= 8:
                raise UnsupportedGIF(f"bad LZW min code size {min_code_size}")
            chunks = []
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
            if int(idx.max(initial=0)) >= len(pal):
                raise UnsupportedGIF("palette index out of range")
            return np.ascontiguousarray(pal[idx].reshape(h, w, 3))
        elif marker == 0x3B:  # trailer
            break
        else:
            raise UnsupportedGIF(f"unknown block marker 0x{marker:02x}")
    raise UnsupportedGIF("no image block found")


def gif_info(data: bytes) -> tuple[int, int]:
    """(width, height) of the logical screen without decoding pixels."""
    if data[:4] != GIF_SIG or len(data) < 10:
        raise UnsupportedGIF("not a GIF payload")
    w, h = struct.unpack_from("<HH", data, 6)
    return w, h
