"""Baseline JPEG codec (mm/jpeg.py): closed-form constant-block round
trips, lossy error bounds, byte stuffing, ZRL long-run handling, a
hand-built 3-component (YCbCr) stream, and the Unsupported* guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from code_indexer_ray.mm.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    STD_QT_LUM,
    ZIGZAG,
    UnsupportedJPEG,
    _BitWriter,
    _canonical_codes,
    _DCT_M,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def _tiles_img(d: int, tx: int = 2, ty: int = 2) -> tuple[np.ndarray, np.ndarray]:
    tiles = np.array(
        [[(d * 3 + (by * tx + bx) * 7) % 256 for bx in range(tx)] for by in range(ty)]
    )
    return np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8), tiles


class TestRoundTrip:
    @pytest.mark.parametrize("d", [0, 7, 42, 123, 254, 255, 999])
    def test_constant_blocks_closed_form(self, d):
        img, tiles = _tiles_img(d, tx=3)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (16, 24, 1)
        want = np.clip(2 * np.floor((tiles - 128) / 2 + 0.5) + 128, 0, 255)
        assert np.array_equal(out[:, :, 0], np.kron(want, np.ones((8, 8))).astype(np.uint8))

    def test_smooth_image_error_bound(self):
        x = np.arange(64)
        y = np.arange(48)[:, None]
        img = (128 + 60 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img))[:, :, 0].astype(np.float64)
        err = np.abs(out - img.astype(np.float64))
        assert err.max() < 20 and err.mean() < 4

    def test_non_multiple_of_8_dims_and_edge_padding(self):
        rng = np.random.default_rng(5)
        for h, w in [(13, 21), (1, 1), (8, 9), (17, 8)]:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            out = decode_jpeg(encode_jpeg(img))
            assert out.shape == (h, w, 1)

    def test_byte_stuffing_exercised(self):
        # scan seeds until an entropy stream contains a stuffed 0xFF 0x00
        rng = np.random.default_rng(0)
        hit = False
        for _ in range(40):
            img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
            payload = encode_jpeg(img)
            body = payload[payload.index(b"\xff\xda") :]
            if b"\xff\x00" in body:
                hit = True
                out = decode_jpeg(payload)
                assert out.shape == (16, 16, 1)
                break
        assert hit, "no stuffed byte produced in 40 random images"

    def test_zrl_long_zero_run(self):
        # image = IDCT of a sparse spectrum: DC + one late AC coefficient →
        # a >15 zero run in zigzag order forces ZRL on encode and decode
        coef = np.zeros((8, 8))
        coef[0, 0] = 8 * 20.0
        ri, ci = divmod(int(ZIGZAG[40]), 8)
        coef[ri, ci] = 200.0
        blk = _DCT_M.T @ coef @ _DCT_M + 128.0
        img = np.clip(np.round(blk), 0, 255).astype(np.uint8)
        # confirm the quantized spectrum really has a long interior run
        f = np.einsum("ux,xz,vz->uv", _DCT_M, img.astype(np.float64) - 128.0, _DCT_M)
        qf = np.floor(np.round(f, 6) / STD_QT_LUM + 0.5).astype(np.int64)
        zz = qf.reshape(-1)[ZIGZAG]
        nz = np.nonzero(zz[1:])[0]
        assert len(nz) and (np.diff(np.concatenate(([0], nz + 1))) > 16).any()
        out = decode_jpeg(encode_jpeg(img))[:, :, 0].astype(np.float64)
        assert np.abs(out - img.astype(np.float64)).max() < 40  # one coarse AC bin


class TestThreeComponent:
    def test_ycbcr_stream_decodes_to_rgb(self):
        """Hand-assemble a 3-component 4:4:4 baseline stream (constant
        Y/Cb/Cr planes, shared luminance tables) and check the JFIF color
        conversion."""
        yv, cbv, crv = 120, 90, 170
        q0 = int(STD_QT_LUM[0, 0])
        dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
        ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
        bw = _BitWriter()
        for v in (yv, cbv, crv):  # one MCU, one DC-only block per component
            qdc = int(np.floor(8 * (v - 128) / q0 + 0.5))
            size, bits = _magnitude(qdc)  # DC pred starts at 0 per component
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(bits, size)
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)
        data = bw.flush()

        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        qz = STD_QT_LUM.reshape(-1)[ZIGZAG]
        stream = b"".join(
            [
                b"\xff\xd8",
                seg(0xFFDB, b"\x00" + bytes(int(x) for x in qz)),
                seg(
                    0xFFC0,
                    struct.pack(">BHHB", 8, 8, 8, 3)
                    + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00",
                ),
                seg(0xFFC4, bytes([0x00] + DC_LUM_BITS + DC_LUM_VALS)),
                seg(0xFFC4, bytes([0x10] + AC_LUM_BITS + AC_LUM_VALS)),
                seg(0xFFDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00"),
                data,
                b"\xff\xd9",
            ]
        )
        out = decode_jpeg(stream)
        assert out.shape == (8, 8, 3)
        rt = lambda v: min(2 * int(np.floor((v - 128) / 2 + 0.5)) + 128, 255)
        y2, cb2, cr2 = rt(yv), rt(cbv), rt(crv)
        r = int(np.clip(round(y2 + 1.402 * (cr2 - 128)), 0, 255))
        g = int(np.clip(round(y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128)), 0, 255))
        b = int(np.clip(round(y2 + 1.772 * (cb2 - 128)), 0, 255))
        assert (out[0, 0] == [r, g, b]).all()
        assert (out == out[0, 0]).all()


class TestUnsupported:
    def test_guards(self):
        img = np.full((8, 8), 100, dtype=np.uint8)
        good = encode_jpeg(img)
        with pytest.raises(UnsupportedJPEG):  # progressive
            decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
        with pytest.raises(UnsupportedJPEG):  # not a JPEG
            decode_jpeg(b"\x00\x01\x02")
        with pytest.raises(UnsupportedJPEG):  # subsampled SOF0
            i = good.index(b"\xff\xc0")
            bad = bytearray(good)
            bad[i + 11] = 0x22  # Hi/Vi
            decode_jpeg(bytes(bad))
        with pytest.raises(UnsupportedJPEG):  # restart interval declared
            i = good.index(b"\xff\xda")
            dri = b"\xff\xdd\x00\x04\x00\x04"
            decode_jpeg(good[:i] + dri + good[i:])
        with pytest.raises(UnsupportedJPEG):  # truncated entropy data
            decode_jpeg(good[:-8])

    def test_malformed_streams_raise_unsupported_not_raw_errors(self):
        """struct.error / KeyError / IndexError from malformed bytes must
        land on the UnsupportedJPEG boundary so the decode stage falls back
        per row instead of the Ray task dying."""
        cases = [
            b"\xff\xd8\xff\xc0\x00\x04\xaa\xbb",  # truncated SOF0 body
            b"\xff\xd8\xff\xda\x00\x03\x01",  # SOS before SOF0, short header
            b"\xff\xd8\xff\xdb\x00\x03\x00",  # truncated DQT
            b"\xff\xd8\xff",  # nothing after signature
        ]
        img = np.full((8, 8), 100, dtype=np.uint8)
        good = encode_jpeg(img)
        # valid stream except the DC Huffman table is stripped → the scan
        # references an undefined table (KeyError inside, Unsupported out)
        i = good.index(b"\xff\xc4")
        ln = struct.unpack(">H", good[i + 2 : i + 4])[0]
        cases.append(good[:i] + good[i + 2 + ln :])
        for payload in cases:
            with pytest.raises(UnsupportedJPEG):
                decode_jpeg(payload)
        # the stage-level contract: such payloads fall back, flagged
        from code_indexer_ray.mm.decode import MediaDecodeStage

        w, h, _f, real = MediaDecodeStage._decode_payload(cases[0])
        assert real is False

    def test_stage_falls_back_flagged(self):
        from code_indexer_ray.mm.decode import MediaDecodeStage

        img = np.full((8, 8), 100, dtype=np.uint8)
        bad = encode_jpeg(img).replace(b"\xff\xc0", b"\xff\xc2", 1)
        w, h, feat, real = MediaDecodeStage._decode_payload(bad)
        assert real is False  # unsupported shape → deterministic fake, flagged
        w, h, feat, real = MediaDecodeStage._decode_payload(encode_jpeg(img))
        assert real is True and (w, h) == (8, 8)
        assert feat == round(100 / 255.0, 6)  # 100 is even → survives exactly


class TestHeaderDimsDowngrade:
    """VERDICT r4 #9: unsupported JPEG shapes downgrade to METADATA-ONLY
    rows — real SOFn dimensions, real_decode=False — instead of md5-fake
    dims, so size-based curation filters stay truthful on progressive
    crawls."""

    def _progressive(self, w=24, h=16):
        img = np.full((h, w), 77, dtype=np.uint8)
        return encode_jpeg(img).replace(b"\xff\xc0", b"\xff\xc2", 1)

    def test_jpeg_dimensions_all_sof_shapes(self):
        from code_indexer_ray.mm.jpeg import jpeg_dimensions

        img = np.arange(192, dtype=np.uint8).reshape(12, 16)
        good = encode_jpeg(img)
        assert jpeg_dimensions(good) == (16, 12, 1)
        # progressive (SOF2) and extended-sequential (SOF1): same header walk
        for marker in (b"\xff\xc1", b"\xff\xc2", b"\xff\xc7", b"\xff\xcb"):
            assert jpeg_dimensions(good.replace(b"\xff\xc0", marker, 1)) == (16, 12, 1)
        # subsampled SOF0: decode refuses, dimensions don't
        i = good.index(b"\xff\xc0")
        sub = bytearray(good); sub[i + 11] = 0x22
        with pytest.raises(UnsupportedJPEG):
            decode_jpeg(bytes(sub))
        assert jpeg_dimensions(bytes(sub)) == (16, 12, 1)
        # non-JPEG / truncated / SOS-before-SOF: None
        assert jpeg_dimensions(b"\x00\x01") is None
        assert jpeg_dimensions(b"\xff\xd8\xff") is None
        assert jpeg_dimensions(b"\xff\xd8\xff\xda\x00\x03\x01") is None

    def test_stage_metadata_only_row_for_progressive(self):
        from code_indexer_ray.mm.decode import MediaDecodeStage

        w, h, feat, real = MediaDecodeStage._decode_payload(self._progressive())
        assert (w, h) == (24, 16)  # REAL header dims
        assert real is False       # flagged: no pixel decode happened
        assert 0.0 <= feat <= 1.0

    def test_mixed_corpus_through_ray_stage(self, ray_session):
        """Baseline (real decode) + progressive (metadata-only) + garbage
        (md5 fake) in ONE corpus: the pipeline completes — nothing aborts —
        and every row class carries the right flag/dims."""
        import ray.data as rd

        from code_indexer_ray.mm.decode import media_decode
        from code_indexer_ray.mm.png import encode_png

        img = np.full((8, 8), 100, dtype=np.uint8)
        rows = [
            {"doc_id": 0, "payload": encode_jpeg(img)},
            {"doc_id": 1, "payload": self._progressive()},
            {"doc_id": 2, "payload": b"definitely not an image"},
            {"doc_id": 3, "payload": encode_png(np.full((5, 7), 10, dtype=np.uint8))},
        ]
        out = (
            media_decode(rd.from_items(rows), concurrency=2, batch_size=2)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert bool(out.loc[0, "real_decode"]) is True
        assert (out.loc[0, "width"], out.loc[0, "height"]) == (8, 8)
        assert bool(out.loc[1, "real_decode"]) is False
        assert (out.loc[1, "width"], out.loc[1, "height"]) == (24, 16)  # header dims
        assert bool(out.loc[2, "real_decode"]) is False  # md5 fake for garbage
        assert bool(out.loc[3, "real_decode"]) is True
        assert (out.loc[3, "width"], out.loc[3, "height"]) == (7, 5)
