"""Real PNG codec: encode/decode round-trips for every supported shape and
encode filter, plus decode of INDEPENDENTLY-filtered scanlines (Average,
Paeth — which our encoder never emits) built directly from the PNG spec's
filter definitions, and loud rejection of unsupported variants."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from code_indexer_ray.mm.png import (
    PNG_SIG,
    UnsupportedPNG,
    _chunk,
    decode_png,
    encode_png,
    png_info,
)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(8, 5, 3), (16, 16, 1), (7, 9, 4), (1, 1, 3), (33, 2, 3)])
    @pytest.mark.parametrize("ft", [0, 1, 2])
    def test_encode_decode(self, shape, ft):
        img = np.random.default_rng(hash(shape) % 2**31).integers(
            0, 256, shape, dtype=np.uint8
        )
        data = encode_png(img, filter_type=ft)
        assert (decode_png(data) == img).all()
        assert png_info(data) == (shape[1], shape[0], shape[2])

    def test_grayscale_2d_input(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = decode_png(encode_png(img))
        assert (out[:, :, 0] == img).all()


def _filter_spec(raw: np.ndarray, c: int, ftype: int) -> bytes:
    """Independent implementation of the PNG FILTER side (spec §6), used to
    build test vectors our encoder never produces."""
    h, stride = raw.shape
    out = bytearray()
    prior = np.zeros(stride, np.int64)
    for y in range(h):
        cur = raw[y].astype(np.int64)
        line = np.zeros(stride, np.int64)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prior[x]
            cc = prior[x - c] if x >= c else 0
            if ftype == 3:  # Average
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else cc)
            line[x] = (cur[x] - pred) & 0xFF
        out.append(ftype)
        out.extend(line.astype(np.uint8).tobytes())
        prior = cur
    return bytes(out)


class TestSpecFilters:
    @pytest.mark.parametrize("ftype", [3, 4])
    @pytest.mark.parametrize("c,color", [(1, 0), (3, 2), (4, 6)])
    def test_decode_average_and_paeth(self, ftype, c, color):
        rng = np.random.default_rng(ftype * 10 + c)
        h, w = 9, 7
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        raw = img.reshape(h, w * c)
        lines = _filter_spec(raw, c, ftype)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        data = (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b"")
        )
        assert (decode_png(data) == img).all()


class TestRejection:
    def test_bad_signature(self):
        with pytest.raises(UnsupportedPNG):
            decode_png(b"notapng" + b"\x00" * 40)

    def test_16bit_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        data = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(UnsupportedPNG, match="unsupported"):
            decode_png(data)

    def test_interlaced_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
        data = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(UnsupportedPNG):
            decode_png(data)


class TestStageRouting:
    def test_png_and_wav_real_other_fake(self):
        import io
        import wave

        from code_indexer_ray.mm.decode import MediaDecodeStage

        st = MediaDecodeStage()
        img = np.full((5, 4, 3), 100, np.uint8)
        w, h, feat, real = st._decode_payload(encode_png(img))
        assert (w, h, real) == (4, 5, True)
        assert feat == pytest.approx(100 / 255, abs=1e-6)

        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(np.array([100, -100, 0, 50], "<i2").tobytes())
        w, h, feat, real = st._decode_payload(bio.getvalue())
        assert (w, h, real) == (1, 4, True)
        assert feat == pytest.approx((100 + 100 + 0 + 50) / 4 / 32768, abs=1e-6)

        w, h, feat, real = st._decode_payload(b"random other bytes")
        assert real is False and 64 <= w < 256 and 64 <= h < 256


class TestMalformedPayloads:
    """Review fix: corrupt PNGs must land on UnsupportedPNG, and the decode
    stage must degrade per row, never kill the batch."""

    def test_truncated_chunk_header(self):
        with pytest.raises(UnsupportedPNG):
            decode_png(PNG_SIG + b"\x00\x00")

    def test_corrupt_idat(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        data = (
            PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"notzlib") + _chunk(b"IEND", b"")
        )
        with pytest.raises(UnsupportedPNG):
            decode_png(data)

    def test_stage_survives_corrupt_payload(self):
        from code_indexer_ray.mm.decode import MediaDecodeStage

        st = MediaDecodeStage()
        w, h, _feat, real = st._decode_payload(PNG_SIG + b"\x00\x00garbage")
        assert real is False and 64 <= w < 256 and 64 <= h < 256

    def test_resize_stage_survives_corrupt_payload(self):
        from code_indexer_ray.mm.stages import ImageResizeStage

        st = ImageResizeStage(4, 4)
        out, real = st._resize(PNG_SIG + b"\x00\x00garbage")
        assert real is False and len(out) == 16
