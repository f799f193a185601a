"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata columns beside
them.  The actual codec work (image decode, resample, frame sampling) needs
libraries not present in this container, so the codec step is STUBBED behind
``DETERMINISTIC_FAKE`` — but the Ray-side plumbing is real and tested:
actor-pool ``map_batches`` stage (decoder state built once per actor), small
``batch_size`` for wide rows, Arrow-native binary in/out, stable output
schema.

Swap :meth:`MediaDecodeStage._decode_payload` for a real decoder (PIL/ffmpeg)
to productionize; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DETERMINISTIC_FAKE = True


class MediaDecodeStage:
    """Actor-pool stage: ``ds.map_batches(MediaDecodeStage, concurrency=N,
    batch_size=64, num_cpus=1, batch_format="pyarrow")``.

    Output schema: doc_id:int64, n_bytes:int64, width:int64, height:int64,
    feat_mean:double — typed metadata a downstream filter/train stage keys on.
    """

    def __init__(self, kind: str = "image"):
        # once per actor: "load the codec" (a real impl opens PIL/ffmpeg here)
        self.kind = kind
        if not DETERMINISTIC_FAKE:
            raise NotImplementedError("real media codecs are not available in this environment")

    @staticmethod
    def _decode_payload(payload: bytes) -> tuple[int, int, float]:
        """Deterministic fake decode: dimensions and a feature scalar derived
        from the payload's md5 — stable across runs/workers."""
        d = hashlib.md5(payload).digest()
        width = 64 + d[0] % 192
        height = 64 + d[1] % 192
        feat = int.from_bytes(d[2:6], "little") / 0xFFFFFFFF
        return width, height, round(feat, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dims = [self._decode_payload(p or b"") for p in payloads]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_bytes": pa.array(
                    [len(p or b"") for p in payloads], type=pa.int64()
                ),
                "width": pa.array([d[0] for d in dims], type=pa.int64()),
                "height": pa.array([d[1] for d in dims], type=pa.int64()),
                "feat_mean": pa.array([d[2] for d in dims], type=pa.float64()),
            }
        )


def media_decode(ds, *, kind: str = "image", concurrency: int = 4, batch_size: int = 64):
    """Run the (stubbed) decode as a proper actor-pool stage."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"kind": kind},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
