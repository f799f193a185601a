"""Real GIF codec: encode/decode round-trips (clear-code path), decode of a
REAL compressing LZW stream built by an independent spec-side compressor
(exercising code-width growth and the KwKwK case our uncompressed encoder
never emits), palette handling, and loud rejection of unsupported variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from code_indexer_ray.mm.gif import (
    GIF_SIG,
    UnsupportedGIF,
    decode_gif,
    encode_gif,
    gif_info,
)


def _lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """Independent spec-side LZW compressor (greedy longest-match, emits
    clear only at stream start, grows code width with the table)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    codes: list[tuple[int, int]] = [(clear, width)]
    w = b""
    for v in indices:
        wk = w + bytes([v])
        if wk in table:
            w = wk
        else:
            codes.append((table[w], width))
            if next_code < 4096:
                table[wk] = next_code
                next_code += 1
                # GIF: ENCODER grows width when next_code exceeds 2^width
                if next_code > (1 << width) and width < 12:
                    width += 1
            w = bytes([v])
    codes.append((table[w], width))
    codes.append((eoi, width))
    out = bytearray()
    acc = nbits = 0
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(w: int, h: int, palette: np.ndarray, min_code_size: int, stream: bytes) -> bytes:
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    out += b";"
    return bytes(out)


_GRAY = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(8, 5), (16, 16), (1, 1), (3, 70), (40, 9)])
    def test_encode_decode(self, shape):
        img = np.random.default_rng(hash(shape) % 2**31).integers(
            0, 256, shape, dtype=np.uint8
        )
        data = encode_gif(img)
        assert (decode_gif(data) == img[:, :, None]).all()
        assert gif_info(data) == (shape[1], shape[0])

    def test_custom_palette(self):
        pal = np.random.default_rng(2).integers(0, 256, (256, 3), dtype=np.uint8)
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        assert (decode_gif(encode_gif(img, palette=pal)) == pal[img]).all()

    def test_multi_subblock_stream(self):
        # 64x64 = 4096 pixels → several 255-byte sub-blocks
        img = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
        assert (decode_gif(encode_gif(img))[:, :, 0] == img).all()


class TestCompressedStreams:
    """Streams from the independent compressor — code-width growth and the
    KwKwK case, which the uncompressed encoder never produces."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_compressing_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 17, (31, 23), dtype=np.uint8)  # repetitive → real compression
        stream = _lzw_compress(img.reshape(-1).tolist(), 8)
        data = _wrap_gif(23, 31, _GRAY, 8, stream)
        assert len(data) < len(encode_gif(img))  # genuinely compressed
        assert (decode_gif(data) == img[:, :, None]).all()

    def test_kwkwk_case(self):
        # 'ababab…' forces code == next_code at the decoder immediately
        idx = [1, 2] * 40
        stream = _lzw_compress(idx, 2)
        data = _wrap_gif(80, 1, _GRAY, 2, stream)
        assert (decode_gif(data)[0, :, 0] == np.array(idx, dtype=np.uint8)).all()

    def test_small_min_code_size_width_growth(self):
        # min code size 2 → width grows 3→4→5… quickly
        rng = np.random.default_rng(9)
        idx = rng.integers(0, 4, 600).tolist()
        stream = _lzw_compress(idx, 2)
        data = _wrap_gif(60, 10, _GRAY, 2, stream)
        assert (decode_gif(data).reshape(-1, 3)[:, 0] == np.array(idx, np.uint8)).all()


class TestRejection:
    def test_bad_signature(self):
        with pytest.raises(UnsupportedGIF):
            decode_gif(b"JIF89a" + bytes(64))

    def test_interlaced_rejected(self):
        img = np.zeros((4, 4), np.uint8)
        data = bytearray(encode_gif(img))
        # image descriptor flags byte: 6 header + 7 LSD + 768 GCT + 1 ',' + 8
        data[6 + 7 + 768 + 9] |= 0x40
        with pytest.raises(UnsupportedGIF):
            decode_gif(bytes(data))

    def test_truncated_stream(self):
        data = encode_gif(np.arange(64, dtype=np.uint8).reshape(8, 8))
        with pytest.raises(UnsupportedGIF):
            decode_gif(data[: len(data) // 2])

    def test_extension_skipped(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        data = bytearray(encode_gif(img))
        # splice a graphic-control extension before the image descriptor
        at = 6 + 7 + 768
        ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        data[at:at] = ext
        assert (decode_gif(bytes(data))[:, :, 0] == img).all()


class TestStageRouting:
    def test_gif_real_junk_fake(self):
        import pyarrow as pa

        from code_indexer_ray.mm.decode import MediaDecodeStage

        img = ((np.arange(5)[:, None] * 3 + np.arange(7)[None, :]) % 256).astype(np.uint8)
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "payload": pa.array(
                    [encode_gif(img), b"GIF8 but not really"], type=pa.binary()
                ),
            }
        )
        out = MediaDecodeStage()(batch)
        assert out["real_decode"].to_pylist() == [True, False]
        assert out["width"].to_pylist()[0] == 7
        assert out["height"].to_pylist()[0] == 5
        assert out["feat_mean"].to_pylist()[0] == round(float(img.mean() / 255.0), 6)
