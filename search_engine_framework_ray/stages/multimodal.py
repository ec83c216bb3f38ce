"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata. The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the codec step is STUBBED — either a clearly-marked
``NotImplementedError`` or a deterministic fake decoder — while the Ray-side
plumbing (schema, actor-pool stage shape, batch sizing for large payloads,
output layout) is real and tested.

Schema convention::

    media: doc_id:int64, kind:string('image'|'audio'), payload:binary,
           meta_width:int32, meta_height:int32, meta_sample_rate:int32

Large binary payloads ⇒ small ``batch_size`` and ``batch_format="pyarrow"``
(binary columns don't survive pandas object dtype well; ray_guide pitfalls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class DecodeImageStage:
    """Actor-pool stage: payload → fixed-size feature vector.

    ``backend="fake"`` derives a deterministic pseudo-decode from the payload
    bytes (stable across runs/partitioning — usable in tests and benchmarks);
    ``backend="pil"`` raises NotImplementedError until a real decoder is
    available in the runtime image.
    """

    def __init__(self, out_size: tuple[int, int] = (8, 8), backend: str = "fake"):
        self.out_size = out_size
        self.backend = backend
        if backend not in ("fake", "pil"):
            raise ValueError(backend)

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        h, w = self.out_size
        seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint32)
        rng = np.random.default_rng(seed)
        return rng.random((h, w), dtype=np.float32).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "pil":
            raise NotImplementedError(
                "real image decode requires PIL/torchvision — not in this "
                "runtime; use backend='fake' for plumbing tests"
            )
        feats = [self._decode_fake(p.as_py()) for p in batch["payload"]]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "feature": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
                "feat_dim": pa.array([len(f) for f in feats], type=pa.int32()),
            }
        )


class AudioFrameSampleStage:
    """Actor-pool stage: audio payload → sampled frame energies (stub).
    Deterministic fake: frame energy = byte-window means."""

    def __init__(self, n_frames: int = 16, backend: str = "fake"):
        self.n_frames = n_frames
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend != "fake":
            raise NotImplementedError("real audio decode not available here")
        out = []
        for p in batch["payload"]:
            data = np.frombuffer(p.as_py(), dtype=np.uint8)
            if data.size == 0:
                out.append([0.0] * self.n_frames)
                continue
            chunks = np.array_split(data.astype(np.float32), self.n_frames)
            out.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "frame_energy": pa.array(out, type=pa.list_(pa.float32())),
            }
        )


def decode_media(ds, kind: str = "image", concurrency: int = 2, batch_size: int = 64):
    """Wire a media dataset through the right actor-pool decode stage —
    small batches because payloads are wide (ray_guide memory notes)."""
    stage = DecodeImageStage if kind == "image" else AudioFrameSampleStage
    return ds.map_batches(
        stage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
