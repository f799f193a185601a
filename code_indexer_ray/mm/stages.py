"""Multimodal actor-pool stages beyond decode: resize, frame-sample, audio
features.

Same contract as :mod:`.decode`: payloads are opaque ``binary`` columns with
typed metadata beside them; codec internals are STUBBED deterministically
(the container has no PIL/ffmpeg), but every Ray-facing concern — actor-pool
``map_batches`` with per-actor setup, small batches for wide rows, 1→N row
expansion for frame sampling, ``list<float>`` feature outputs, stable
schemas — is real and tested.  Swap the ``_fake_*`` kernels for real codecs
to productionize; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FRAME_SLICE_BYTES = 256
FRAME_MS = 40  # fake 25 fps


class ImageResizeStage:
    """binary → binary resize stage (actor pool).

    Output: doc_id, payload (resized bytes), width, height, real_resize.
    PNG payloads get a REAL decode → nearest-neighbour resample → re-encode
    through the in-repo codec (:mod:`.png`); other formats keep the
    deterministic stride-sample fake, flagged ``real_resize=False``.
    """

    def __init__(self, width: int = 64, height: int = 64):
        self.width = int(width)
        self.height = int(height)
        # codec state resolved once per actor, not per payload
        from .bmp import BMP_SIG, UnsupportedBMP, decode_bmp, encode_bmp
        from .png import PNG_SIG, UnsupportedPNG, decode_png, encode_png

        self._png_sig = PNG_SIG
        self._unsupported = UnsupportedPNG
        self._decode = staticmethod(decode_png).__func__
        self._encode = staticmethod(encode_png).__func__
        self._bmp_sig = BMP_SIG
        self._bmp_unsupported = UnsupportedBMP
        self._bmp_decode = staticmethod(decode_bmp).__func__
        self._bmp_encode = staticmethod(encode_bmp).__func__

    def _fake_resize(self, payload: bytes) -> bytes:
        n_out = self.width * self.height
        if not payload:
            return bytes(n_out)
        src = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(n_out, dtype=np.int64) * len(src)) // n_out
        return src[idx].tobytes()

    def _resize(self, payload: bytes) -> tuple[bytes, bool]:
        if payload[:8] == self._png_sig:
            try:
                img = self._decode(payload)
            except self._unsupported:
                pass
            else:
                h, w, _c = img.shape
                ys = (np.arange(self.height, dtype=np.int64) * h) // self.height
                xs = (np.arange(self.width, dtype=np.int64) * w) // self.width
                return self._encode(img[ys][:, xs]), True
        if payload[:2] == self._bmp_sig:
            try:
                img = self._bmp_decode(payload)
            except self._bmp_unsupported:
                pass
            else:
                h, w, _c = img.shape
                ys = (np.arange(self.height, dtype=np.int64) * h) // self.height
                xs = (np.arange(self.width, dtype=np.int64) * w) // self.width
                return self._bmp_encode(img[ys][:, xs]), True
        return self._fake_resize(payload), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = [self._resize(p or b"") for p in payloads]
        n = len(out)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "payload": pa.array([o[0] for o in out], type=pa.binary()),
                "width": pa.array(np.full(n, self.width, dtype=np.int64)),
                "height": pa.array(np.full(n, self.height, dtype=np.int64)),
                "real_resize": pa.array([o[1] for o in out], type=pa.bool_()),
            }
        )


class FrameSampleStage:
    """video-payload → frame rows (1→N expansion inside ``map_batches``).

    Each input row yields ``1 + min(3, n_bytes // 1024)`` frames; frame ``k``
    is the ``FRAME_SLICE_BYTES``-byte slice at offset ``k * (n_bytes //
    n_frames)``, stamped with a fake 25 fps timestamp.  Output: doc_id,
    frame_idx, ts_ms, frame_bytes, frame_md5.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_idx, out_ts, out_nb, out_md5 = [], [], [], [], []
        for i, p in enumerate(batch["payload"].to_pylist()):
            p = p or b""
            n = len(p)
            n_frames = 1 + min(3, n // 1024)
            step = n // n_frames if n_frames else 0
            for k in range(n_frames):
                sl = p[k * step : k * step + FRAME_SLICE_BYTES]
                out_doc.append(int(ids[i]))
                out_idx.append(k)
                out_ts.append(k * FRAME_MS)
                out_nb.append(len(sl))
                out_md5.append(hashlib.md5(sl).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "ts_ms": pa.array(out_ts, type=pa.int64()),
                "frame_bytes": pa.array(out_nb, type=pa.int64()),
                "frame_md5": pa.array(out_md5, type=pa.string()),
            }
        )


class AudioFeatureStage:
    """audio-payload → fixed-width feature vector (``list<float32>``) stage.

    The fake kernel derives ``dim`` floats from the payload's md5 (stable
    across runs/workers) — the output shape is exactly what a real
    mfcc/embedding model stage produces, so downstream ANN/dedup pipelines
    compose against it unchanged.
    """

    def __init__(self, dim: int = 16):
        self.dim = int(dim)

    def _fake_features(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._fake_features(p or b"") for p in payloads])
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_samples": pa.array(
                    [len(p or b"") // 2 for p in payloads], type=pa.int64()
                ),
                "features": pa.array(list(feats), type=pa.list_(pa.float32())),
            }
        )


def media_resize(ds, *, width: int = 64, height: int = 64, concurrency: int = 4, batch_size: int = 64):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_frames(ds, *, concurrency: int = 4, batch_size: int = 64):
    return ds.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_audio_features(ds, *, dim: int = 16, concurrency: int = 4, batch_size: int = 64):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
