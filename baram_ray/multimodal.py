"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Uncompressed formats decode NATIVELY (``baram_ray.codecs``: PPM
images, WAV PCM audio, and the PPMV multi-frame container — pure
numpy/stdlib): ``DecodeStage``/``ResizeStage``/``FeatureStage``/
``FrameSampleStage`` sniff the payload magic and run real pixel/
sample kernels end-to-end. Compressed codecs (JPEG/PNG/MP4) still
need PIL/ffmpeg, which this container lacks: for those,
``real_decode=True`` raises ``NotImplementedError`` at the exact call
site a library decoder slots into, and the deterministic fake derives
properties from the payload bytes. Everything around that remaining
stub IS real and tested: the Arrow ``binary`` schema, small-batch
sizing for large payloads, actor-pool construction, output layout.

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


def synth_media_table(n: int, seed: int = 42,
                      real_payloads: bool = False) -> pa.Table:
    """Deterministic media corpus. ``real_payloads=True`` emits REAL
    PPM/WAV/PPMV bytes (natively decodable end-to-end); the default
    keeps the seeded opaque bytes the compressed-codec stubs use."""
    if real_payloads:
        return _synth_real_media(n, seed)
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


def _synth_real_media(n: int, seed: int) -> pa.Table:
    from baram_ray import codecs
    rng = np.random.RandomState(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = int(rng.randint(8, 48)), int(rng.randint(8, 48))
            payload = codecs.encode_ppm(
                rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
            width, height, dur = w, h, 0
        elif kind == "audio":
            rate = 8000
            ns = int(rng.randint(400, 4000))
            payload = codecs.encode_wav(
                (rng.randn(ns) * 3000).astype(np.int16), rate)
            width = height = 0
            dur = int(ns * 1000 / rate)
        else:
            nf = int(rng.randint(2, 6))
            frame_ms = 1000
            frames = [rng.randint(0, 256, (12, 16, 3)).astype(np.uint8)
                      for _ in range(nf)]
            payload = codecs.encode_ppmv(frames, frame_ms)
            width, height, dur = 16, 12, nf * frame_ms
        rows["item_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(dur)
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
        # auto-detect installed codec wheels (backends.py): PIL / PyAV
        # take the compressed formats the native kernels can't; the
        # native PPM/WAV/PPMV branches below still run first
        self._auto_fn = None
        if real_decode and decode_fn is None:
            from baram_ray import backends
            self._auto_fn = backends.media_decode_fn()

    def _decode_one(self, kind: str, payload: bytes) -> dict:
        if self._decode_fn is not None:
            return self._decode_fn(kind, payload)
        from baram_ray import codecs
        fmt = codecs.sniff_kind(payload)
        # Native-decode branch: a payload whose first bytes merely
        # LOOK like P6/RIFF/PPMV may still be malformed; when
        # real_decode is False a decode failure must fall through to
        # the deterministic fake, not propagate.
        try:
            if fmt == "ppm":                    # REAL pixel decode
                img = codecs.decode_ppm(payload)
                return {"ok": True, "decoded_width": img.shape[1],
                        "decoded_height": img.shape[0], "n_frames": 1,
                        "payload_sha256":
                            hashlib.sha256(payload).hexdigest()}
            if fmt == "wav":                    # REAL sample decode
                samples, rate = codecs.decode_wav(payload)
                return {"ok": True, "decoded_width": 0,
                        "decoded_height": 0,
                        "n_frames": max(1, len(samples) * 1000
                                        // max(rate, 1) // 1000 or 1),
                        "payload_sha256":
                            hashlib.sha256(payload).hexdigest()}
            if fmt == "ppmv":                   # REAL frame decode
                frames, _ = codecs.decode_ppmv(payload)
                h, w = (frames[0].shape[:2] if frames else (0, 0))
                return {"ok": True, "decoded_width": w,
                        "decoded_height": h, "n_frames": len(frames),
                        "payload_sha256":
                            hashlib.sha256(payload).hexdigest()}
        except Exception:
            if self.real_decode:
                raise
        if self.real_decode:
            if self._auto_fn is not None:
                return self._auto_fn(kind, payload)
            raise NotImplementedError(
                "compressed codec (JPEG/PNG/MP4) needs an external "
                "library; pass decode_fn=<your decoder> to DecodeStage "
                "or install PIL / PyAV")
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
        # auto-detect a PIL-backed extractor for compressed images
        # (backends.py); native PPM/WAV/PPMV branches still run first
        self._auto_feat = None
        if real_model and feature_fn is None:
            from baram_ray import backends
            self._auto_feat = backends.pil_feature_fn(dim)

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
            from baram_ray import codecs
            feats = []
            for p in payloads:
                fmt = codecs.sniff_kind(p)
                if fmt == "ppm":                # REAL image features
                    v = codecs.rgb_hist_features(codecs.decode_ppm(p))
                elif fmt == "wav":              # REAL audio features
                    v = codecs.audio_features(*codecs.decode_wav(p))
                elif fmt == "ppmv":             # mean of frame features
                    frames, _ = codecs.decode_ppmv(p)
                    v = np.mean([codecs.rgb_hist_features(f)
                                 for f in frames], axis=0)                         .astype(np.float32)
                elif self._auto_feat is not None:
                    v = self._auto_feat([p])[0]
                else:
                    raise NotImplementedError(
                        "compressed codec needs an external library; "
                        "pass feature_fn=<your batched extractor> or "
                        "install PIL")
                out = np.zeros(self.dim, dtype=np.float32)
                out[:min(self.dim, len(v))] = v[:self.dim]
                feats.append(out.tolist())
            return pa.table({
                "item_id": batch["item_id"],
                "feature": pa.array(feats, pa.list_(pa.float32())),
            })
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
    """video → sampled frame rows (1 row in, N rows out; flat-map
    shape). ``decode_frames=True`` extracts REAL frames from PPMV
    payloads (each output row carries the frame's PPM bytes)."""

    def __init__(self, every_ms: int = 10_000,
                 decode_frames: bool = False):
        self.every_ms = every_ms
        self.decode_frames = decode_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_frames:
            from baram_ray import codecs
            ids, fis, tss, frames_out = [], [], [], []
            for i, kind, p in zip(batch["item_id"].to_pylist(),
                                  batch["kind"].to_pylist(),
                                  batch["payload"].to_pylist()):
                if kind != "video" or codecs.sniff_kind(p) != "ppmv":
                    continue
                frames, frame_ms = codecs.decode_ppmv(p)
                step = max(1, self.every_ms // max(frame_ms, 1))
                for fi in range(0, len(frames), step):
                    ids.append(i)
                    fis.append(fi)
                    tss.append(fi * frame_ms)
                    frames_out.append(codecs.encode_ppm(frames[fi]))
            return pa.table({
                "item_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fis, pa.int32()),
                "ts_ms": pa.array(tss, pa.int32()),
                "frame_payload": pa.array(frames_out, pa.binary()),
            })
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
            # REAL pixel resize for natively-decodable payloads
            # (expects (item_id, payload) rows); compressed codecs
            # still need PIL — that path raises
            from baram_ray import codecs
            ids, ws, hs, payloads = [], [], [], []
            for i, p in zip(batch["item_id"].to_pylist(),
                            batch["payload"].to_pylist()):
                if codecs.sniff_kind(p) != "ppm":
                    raise NotImplementedError(
                        "compressed codec needs PIL; only PPM resizes "
                        "natively")
                img = codecs.resize_nearest(codecs.decode_ppm(p),
                                            self.target)
                ids.append(i)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                payloads.append(codecs.encode_ppm(img))
            return pa.table({
                "item_id": pa.array(ids, pa.int64()),
                "out_width": pa.array(ws, pa.int32()),
                "out_height": pa.array(hs, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            })
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
