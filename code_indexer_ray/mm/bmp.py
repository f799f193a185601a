"""Real BMP codec — pure numpy, no external imaging library.

Windows BMP (public BITMAPINFOHEADER layout) is uncompressed padded
scanlines after a fixed header, which makes it the simplest real image
format to support: decode is one ``np.frombuffer`` + reshape + row flip.
Supported: BI_RGB (uncompressed) 24-bit BGR and 32-bit BGRA, bottom-up or
top-down (negative height), plus 8-bit paletted.  Anything else (RLE,
bitfields, 1/4-bit) raises ``UnsupportedBMP`` — loudly, never silently
wrong.  Encode writes 24-bit bottom-up BI_RGB, so decode round-trips.

Reference provenance: the reference treats media as opaque payloads handed
to external libs; this codec exists so the Ray-side decode stage
(`mm/decode.py`) operates on REAL bytes for a second image container
format without PIL in the container.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_SIG = b"BM"


class UnsupportedBMP(ValueError):
    pass


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP from an (H, W) grayscale or (H, W, 3)
    RGB uint8 array."""
    if img.dtype != np.uint8:
        raise ValueError("encode_bmp expects uint8 pixels")
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W) or (H, W, 3)")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR order, bottom-up rows, each row padded to a 4-byte boundary
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", BMP_SIG, offset + len(pixel_data), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + dib + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) RGB uint8 array."""
    if data[:2] != BMP_SIG or len(data) < 54:
        raise UnsupportedBMP("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:
        raise UnsupportedBMP(f"DIB header size {dib_size} (BITMAPCOREHEADER unsupported)")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0:
        raise UnsupportedBMP(f"planes={planes} compression={compression} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise UnsupportedBMP(f"{bpp}-bit BMP unsupported")
    if w <= 0 or h_raw == 0:
        raise UnsupportedBMP(f"bad dimensions {w}x{h_raw}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = (w * bpp + 7) // 8
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(data) < need:
        raise UnsupportedBMP(f"truncated pixel data ({len(data)} < {need} bytes)")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes]
    if bpp == 8:
        # palette sits between the DIB header and the pixel data
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4, offset=pal_off)
        pal = pal.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_colors:
            raise UnsupportedBMP("palette index out of range")
        img = pal[idx]
    elif bpp == 24:
        img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    else:  # 32-bit BGRA/BGRX: alpha dropped
        img = rows.reshape(h, row_bytes)[:, : w * 4].reshape(h, w, 4)[:, :, 2::-1]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def bmp_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, bpp) from the headers without decoding pixels."""
    if data[:2] != BMP_SIG or len(data) < 30:
        raise UnsupportedBMP("not a BMP payload")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    return w, abs(h_raw), bpp
