"""Real BMP codec: 24-bit encode/decode round-trips, decode of 32-bit and
8-bit-paletted payloads built directly from the spec layout (which our
encoder never emits), top-down row order, loud rejection of unsupported
variants, and stage routing (BMP real, junk flagged fake)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from code_indexer_ray.mm.bmp import (
    BMP_SIG,
    UnsupportedBMP,
    bmp_info,
    decode_bmp,
    encode_bmp,
)


def _headers(w: int, h: int, bpp: int, pixel_len: int, extra: bytes = b"") -> bytes:
    offset = 14 + 40 + len(extra)
    head = struct.pack("<2sIHHI", BMP_SIG, offset + pixel_len, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, pixel_len, 0, 0, 0, 0)
    return head + dib + extra


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(8, 5, 3), (16, 16, 3), (1, 1, 3), (3, 7, 3), (9, 2, 3)])
    def test_encode_decode(self, shape):
        img = np.random.default_rng(hash(shape) % 2**31).integers(
            0, 256, shape, dtype=np.uint8
        )
        data = encode_bmp(img)
        assert (decode_bmp(data) == img).all()
        assert bmp_info(data) == (shape[1], shape[0], 24)

    def test_grayscale_2d_input(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = decode_bmp(encode_bmp(img))
        assert (out == img[:, :, None]).all()

    def test_row_padding_exercised(self):
        # w=5 → 15-byte rows padded to 16: any stride mistake garbles row 1+
        img = np.arange(5 * 5 * 3, dtype=np.uint8).reshape(5, 5, 3)
        assert (decode_bmp(encode_bmp(img)) == img).all()


class TestSpecSideDecodes:
    """Payloads assembled from the spec layout, not by our encoder."""

    def test_32bit_bgra(self):
        img = np.random.default_rng(7).integers(0, 256, (4, 3, 3), dtype=np.uint8)
        # bottom-up BGRA rows, stride is already a multiple of 4
        bgra = np.concatenate(
            [img[::-1, :, ::-1], np.full((4, 3, 1), 0xAA, np.uint8)], axis=2
        )
        data = _headers(3, 4, 32, bgra.nbytes) + bgra.tobytes()
        assert (decode_bmp(data) == img).all()

    def test_8bit_palette(self):
        pal = np.random.default_rng(3).integers(0, 256, (256, 3), dtype=np.uint8)
        idx = np.arange(6 * 5, dtype=np.uint8).reshape(6, 5)
        stride = 8  # 5-byte rows padded to 8
        rows = np.zeros((6, stride), dtype=np.uint8)
        rows[:, :5] = idx[::-1]
        pal_blob = np.concatenate(
            [pal[:, ::-1], np.zeros((256, 1), np.uint8)], axis=1
        ).tobytes()
        data = _headers(5, 6, 8, rows.nbytes, extra=pal_blob) + rows.tobytes()
        assert (decode_bmp(data) == pal[idx]).all()

    def test_top_down_negative_height(self):
        img = np.random.default_rng(11).integers(0, 256, (4, 4, 3), dtype=np.uint8)
        bgr = img[:, :, ::-1]  # top-down: NO row flip
        head = struct.pack("<2sIHHI", BMP_SIG, 54 + bgr.nbytes, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, 4, -4, 1, 24, 0, bgr.nbytes, 0, 0, 0, 0)
        assert (decode_bmp(head + dib + bgr.tobytes()) == img).all()


class TestRejection:
    def test_bad_signature(self):
        with pytest.raises(UnsupportedBMP):
            decode_bmp(b"PM" + bytes(64))

    def test_rle_rejected(self):
        head = struct.pack("<2sIHHI", BMP_SIG, 54, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, 0, 0, 0, 0, 0)
        with pytest.raises(UnsupportedBMP):
            decode_bmp(head + dib)

    def test_truncated_pixels(self):
        data = encode_bmp(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(UnsupportedBMP):
            decode_bmp(data[:-10])

    def test_1bit_rejected(self):
        head = struct.pack("<2sIHHI", BMP_SIG, 54, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 1, 0, 0, 0, 0, 0, 0)
        with pytest.raises(UnsupportedBMP):
            decode_bmp(head + dib)


class TestStageRouting:
    def test_bmp_real_junk_fake(self):
        import pyarrow as pa

        from code_indexer_ray.mm.decode import MediaDecodeStage

        img = (np.add.outer(np.arange(6), np.arange(9)) % 256).astype(np.uint8)
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "payload": pa.array(
                    [encode_bmp(img), b"BMnot-really-a-bmp"], type=pa.binary()
                ),
            }
        )
        out = MediaDecodeStage()(batch)
        assert out["real_decode"].to_pylist() == [True, False]
        assert out["width"].to_pylist()[0] == 9
        assert out["height"].to_pylist()[0] == 6
        assert out["feat_mean"].to_pylist()[0] == round(
            float(np.repeat(img[:, :, None], 3, axis=2).mean() / 255.0), 6
        )

    def test_resize_stage_bmp_real(self):
        import pyarrow as pa

        from code_indexer_ray.mm.bmp import decode_bmp as dec
        from code_indexer_ray.mm.stages import ImageResizeStage

        img = np.random.default_rng(5).integers(0, 256, (12, 10, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "payload": pa.array([encode_bmp(img)], type=pa.binary()),
            }
        )
        out = ImageResizeStage(width=4, height=4)(batch)
        assert out["real_resize"].to_pylist() == [True]
        ys = (np.arange(4, dtype=np.int64) * 12) // 4
        xs = (np.arange(4, dtype=np.int64) * 10) // 4
        assert (dec(out["payload"].to_pylist()[0]) == img[ys][:, xs]).all()
