"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are ``binary`` columns moved through actor-pool
``map_batches`` stages.  The ``real`` backend decodes two formats in pure
numpy (no external media libraries exist in this environment): binary PPM
(P6) images and PCM16 WAV audio — decode, block-mean resize, frame
sampling and feature extraction are all real, tested kernels.  Payloads
in other containers (JPEG/MP3/...) raise a clear ``ValueError``;
``backend="fake"`` keeps the hash-derived deterministic features for
plumbing tests.

Scale notes: binary payloads are large → small ``batch_size`` (payload ×
batch × concurrency must fit worker heap), ``batch_format="pyarrow"``
(binary columns don't round-trip pandas cleanly), decode state (codec
tables, models) loaded once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib
import struct

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


# ---------------------------------------------------------------------------
# pure-numpy codecs: binary PPM (P6) images, PCM16 WAV audio
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 array (h, w, 3).  Pure parser: magic,
    whitespace/comment-tolerant header, maxval 255 raster."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace after maxval
    raster = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-mean downsample (area interpolation on integral blocks): crop
    to multiples of the output grid, then mean over each block."""
    h, w, c = img.shape
    bh, bw = max(h // out_h, 1), max(w // out_w, 1)
    crop = img[: bh * min(out_h, h), : bw * min(out_w, w)]
    ch, cw = crop.shape[0] // bh, crop.shape[1] // bw
    small = crop[: ch * bh, : cw * bw].reshape(ch, bh, cw, bw, c).mean(axis=(1, 3))
    return np.clip(np.rint(small), 0, 255).astype(np.uint8)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM16 WAV → (sample_rate, int16 samples shaped (n, channels)).
    Walks RIFF chunks (fmt then data); PCM16 only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    rate = channels = bits = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding fmt={fmt} bits={bits}")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, np.int16)
    return rate, samples.reshape(-1, channels)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    s = np.ascontiguousarray(samples, np.int16)
    n_ch = s.shape[1] if s.ndim == 2 else 1
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def frame_rms(samples: np.ndarray, n_frames: int) -> np.ndarray:
    """Frame-sample an audio stream: mono-mix, split into n_frames equal
    windows, RMS per window normalized to [0, 1]."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = mono.size
    if n == 0:
        return np.zeros(n_frames, np.float32)
    edges = np.linspace(0, n, n_frames + 1).astype(np.int64)
    out = np.zeros(n_frames, np.float64)
    for f in range(n_frames):
        seg = mono[edges[f]:edges[f + 1]]
        if seg.size:
            out[f] = np.sqrt(np.mean(seg * seg))
    return out.astype(np.float32)


class MediaDecoder:
    """Actor-pool decode/feature stage.

    backend="real" decodes PPM images (block-mean luminance grid of
    ``feature_dim`` cells) and WAV audio (``feature_dim`` frame RMS
    energies) in pure numpy; any other container raises ``ValueError``
    with the sniffed magic.  backend="fake" derives a deterministic
    feature vector from the payload bytes so downstream stages (ANN,
    dedup) can be exercised regardless of payload format.
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
        payload = payload or b""
        if payload.startswith(b"P6"):
            img = decode_ppm(payload)
            side = max(int(np.sqrt(self.dim)), 1)
            gray = resize_block_mean(img, side, side).mean(axis=2) / 255.0
            flat = gray.ravel()
            out = np.zeros(self.dim, np.float32)
            out[: min(flat.size, self.dim)] = flat[: self.dim]
            return out
        if payload[:4] == b"RIFF":
            _, samples = decode_wav(payload)
            return frame_rms(samples, self.dim)
        raise ValueError(
            f"unsupported media container (magic {payload[:4]!r}); "
            "real backend decodes P6 PPM images and PCM16 WAV audio")

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


def resize_ppm_batch(batch: pa.Table, out_h: int = 32, out_w: int = 32,
                     payload_col: str = "payload",
                     id_col: str = "doc_id") -> pa.Table:
    """Thumbnail stage: P6 PPM in → block-mean-resized P6 PPM out, with
    the decoded output dimensions as typed metadata columns."""
    ids, outs, ws, hs = [], [], [], []
    for i, p in zip(batch[id_col].to_pylist(), batch[payload_col].to_pylist()):
        img = resize_block_mean(decode_ppm(p), out_h, out_w)
        ids.append(i)
        outs.append(encode_ppm(img))
        hs.append(img.shape[0])
        ws.append(img.shape[1])
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "payload": pa.array(outs, pa.large_binary()),
        "height": pa.array(hs, pa.int32()),
        "width": pa.array(ws, pa.int32()),
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
        concurrency=(1, concurrency),  # min=1: never starve upstream tasks
        num_cpus=1,
    )
