"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are ``binary`` columns moved through actor-pool
``map_batches`` stages.  The decode kernels themselves are STUBBED (no
image/audio libraries in this environment): ``MediaDecoder`` raises
``NotImplementedError`` for ``backend="real"`` and provides a deterministic
fake (``backend="fake"``) so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested end to end.

Scale notes: binary payloads are large → small ``batch_size`` (payload ×
batch × concurrency must fit worker heap), ``batch_format="pyarrow"``
(binary columns don't round-trip pandas cleanly), decode state (codec
tables, models) loaded once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def attach_media_meta(batch: pa.Table, payload_col: str = "payload",
                      id_col: str = "doc_id") -> pa.Table:
    """(id, n_bytes, payload_sha256) — cheap metadata, no decode."""
    payloads = batch[payload_col].to_pylist()
    return pa.table({
        id_col: batch[id_col],
        "n_bytes": pa.array([len(p) if p else 0 for p in payloads], pa.int64()),
        "payload_sha256": pa.array(
            [hashlib.sha256(p or b"").hexdigest() for p in payloads], pa.string()
        ),
    })


class MediaDecoder:
    """Actor-pool decode/feature stage.

    backend="real" is a clearly-marked stub: decoding image/audio bytes
    requires libs absent from this container.  backend="fake" derives a
    deterministic feature vector from the payload bytes so downstream
    stages (ANN, dedup) can be exercised.
    """

    def __init__(self, backend: str = "fake", feature_dim: int = 16,
                 payload_col: str = "payload", id_col: str = "doc_id"):
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.backend = backend
        self.dim = feature_dim
        self.payload_col = payload_col
        self.id_col = id_col

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not available in this "
            "environment — use backend='fake' for pipeline testing"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload or b"").digest()
        raw = np.frombuffer((h * ((self.dim * 4) // len(h) + 1))[: self.dim * 4], np.uint32)
        return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_real if self.backend == "real" else self._decode_fake
        feats = [decode(p) for p in batch[self.payload_col].to_pylist()]
        return pa.table({
            self.id_col: batch[self.id_col],
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


def decode_features(ds, backend: str = "fake", feature_dim: int = 16,
                    payload_col: str = "payload", id_col: str = "doc_id",
                    concurrency: int = 4, batch_size: int = 64):
    """Actor-pool feature extraction over a binary payload column."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"backend": backend, "feature_dim": feature_dim,
                               "payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,   # binary payloads: keep batches small
        concurrency=concurrency,
        num_cpus=1,
    )
