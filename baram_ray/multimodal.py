"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Media libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
*decode kernels* are stubbed: ``DecodeStage(real_decode=True)`` raises
``NotImplementedError`` at the exact call site a real decoder would slot
into, and the default deterministic fake derives "decoded" properties from
the payload bytes. Everything around the stub IS real and tested: the
Arrow ``binary`` schema, small-batch sizing for large payloads, actor-pool
construction, and the output layout.

Scale notes: payload rows are wide → ``batch_size`` small (64 default) so
batch × concurrency fits worker heap; feature outputs are narrow tables
that drop the payload column immediately (never carry blobs past the stage
that needs them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),            # declared metadata (may be 0=unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.randint(1_000, 50_000))
        payload = hashlib.blake2b(f"{seed}:{i}".encode(),
                                  digest_size=32).digest() * (size // 32 + 1)
        rows["item_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload[:size])
        rows["width"].append(int(rng.randint(16, 4096)) if kind == "image" else 0)
        rows["height"].append(int(rng.randint(16, 4096)) if kind == "image" else 0)
        rows["duration_ms"].append(int(rng.randint(500, 600_000))
                                   if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStage:
    """Actor-pool UDF: payload bytes → decoded properties.

    Real decoders (PIL.Image.open / av.open / soundfile.read) would be
    loaded ONCE here in ``__init__`` and applied per batch; this container
    has none, so the fake derives deterministic properties from the bytes.
    Use ``map_batches(DecodeStage, concurrency=N, batch_size=64,
    num_cpus=1)`` — small batches: payloads are wide rows.
    """

    def __init__(self, real_decode: bool = False, decode_fn=None):
        # decode_fn: user-supplied (kind, payload) → dict with keys
        # ok / decoded_width / decoded_height / n_frames /
        # payload_sha256 — the injection point for a real PIL/ffmpeg
        # decoder without editing library code
        self.real_decode = real_decode
        self._decode_fn = decode_fn

    def _decode_one(self, kind: str, payload: bytes) -> dict:
        if self._decode_fn is not None:
            return self._decode_fn(kind, payload)
        if self.real_decode:
            raise NotImplementedError(
                "media codecs not available in this container; "
                "pass decode_fn=<your decoder> to DecodeStage")
        h = hashlib.blake2b(payload, digest_size=16).digest()
        return {
            "ok": True,
            "decoded_width": 16 + h[0] % 4080,
            "decoded_height": 16 + h[1] % 4080,
            "n_frames": 1 if kind == "image" else 1 + h[2] % 240,
            "payload_sha256": hashlib.sha256(payload).hexdigest(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self._decode_one(k, p) for k, p in
                zip(batch["kind"].to_pylist(), batch["payload"].to_pylist())]
        return pa.table({
            "item_id": batch["item_id"],
            "kind": batch["kind"],
            "ok": pa.array([o["ok"] for o in outs], pa.bool_()),
            "decoded_width": pa.array([o["decoded_width"] for o in outs], pa.int32()),
            "decoded_height": pa.array([o["decoded_height"] for o in outs], pa.int32()),
            "n_frames": pa.array([o["n_frames"] for o in outs], pa.int32()),
            "payload_sha256": pa.array([o["payload_sha256"] for o in outs], pa.string()),
            "payload_bytes": pa.array(
                [len(p) for p in batch["payload"].to_pylist()], pa.int64()),
        })


class FeatureStage:
    """Payload → fixed-dim feature vector (deterministic fake embedding;
    a real model runs batched inference here, loaded once per actor)."""

    def __init__(self, dim: int = 64, real_model: bool = False,
                 feature_fn=None):
        # feature_fn: user-supplied batched extractor,
        # list[bytes] → (B, dim) array-like — the real-model slot
        self.dim = dim
        self.real_model = real_model
        self._feature_fn = feature_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self._feature_fn is not None:
            out = np.asarray(self._feature_fn(payloads), dtype=np.float32)
            if out.shape != (batch.num_rows, self.dim):
                raise ValueError(
                    f"feature_fn returned {out.shape}, expected "
                    f"({batch.num_rows}, {self.dim})")
            feats = [v.tolist() for v in out]
            return pa.table({
                "item_id": batch["item_id"],
                "feature": pa.array(feats, pa.list_(pa.float32())),
            })
        if self.real_model:
            raise NotImplementedError(
                "no model runtime in this container; pass "
                "feature_fn=<your batched extractor> to FeatureStage")
        feats = []
        for p in payloads:
            seed = int.from_bytes(
                hashlib.blake2b(p, digest_size=8).digest(), "big") % (2**31)
            feats.append(np.random.RandomState(seed)
                         .randn(self.dim).astype(np.float32).tolist())
        return pa.table({
            "item_id": batch["item_id"],
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


class FrameSampleStage:
    """video → sampled frame rows (1 row in, N rows out; flat-map shape)."""

    def __init__(self, every_ms: int = 10_000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids, frame_idx, ts_ms = [], [], []
        for i, kind, dur in zip(batch["item_id"].to_pylist(),
                                batch["kind"].to_pylist(),
                                batch["duration_ms"].to_pylist()):
            if kind != "video":
                continue
            for fi, t in enumerate(range(0, int(dur), self.every_ms)):
                item_ids.append(i); frame_idx.append(fi); ts_ms.append(t)
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "ts_ms": pa.array(ts_ms, pa.int32()),
        })


class ResizeStage:
    """Image resize to a target box with aspect preserved (the standard
    training-data image-prep step). Real impl: PIL thumbnail per batch,
    loaded once per actor; this container has no codecs, so the output
    DIMENSIONS (the part downstream layout depends on) are computed for
    real from the decode stage's width/height, and the resized payload
    is honestly stubbed as the original bytes + a resized flag.

    Shape: runs AFTER DecodeStage on its narrow property rows —
    ``map_batches(ResizeStage(256), concurrency=N, batch_size=64)``.
    """

    def __init__(self, target: int = 256, real_resize: bool = False):
        self.target = target
        self.real_resize = real_resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_resize:
            raise NotImplementedError(
                "media codecs not available in this container; "
                "slot PIL thumbnail here")
        import numpy as np
        w = batch["decoded_width"].to_numpy().astype(np.float64)
        h = batch["decoded_height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.target / np.maximum(w, h))
        return pa.table({
            "item_id": batch["item_id"],
            "out_width": pa.array(np.maximum(1, np.round(w * scale))
                                  .astype(np.int32), pa.int32()),
            "out_height": pa.array(np.maximum(1, np.round(h * scale))
                                   .astype(np.int32), pa.int32()),
            "resized": pa.array((scale < 1.0), pa.bool_()),
        })
