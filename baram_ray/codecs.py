"""Native media codecs — pure numpy/stdlib, no PIL/ffmpeg required.

The container has no media libraries, but three formats need none:

- **PPM (P6)** binary netpbm images — header + raw RGB bytes;
- **WAV** PCM audio — stdlib ``wave``;
- **PPMV** — a toy-but-real multi-frame container for the video path
  (magic + frame count + length-prefixed PPM frames), so
  frame-sampling extracts REAL pixel frames.

These make the multimodal stages genuinely end-to-end for
uncompressed media: ``DecodeStage``/``ResizeStage``/``FeatureStage``
detect the magic bytes and run these kernels; the
``NotImplementedError`` stubs remain only for compressed codecs
(JPEG/PNG/MP4) that truly need an external library.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ------------------------------ PPM ------------------------------- #

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM is RGB (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 bytes → (H, W, 3) uint8 (whitespace/comment-tolerant
    header parse, maxval 255 only)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to EOL
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                       # single ws after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos)
    return data.reshape(h, w, 3).copy()


def resize_nearest(img: np.ndarray, target: int) -> np.ndarray:
    """Nearest-neighbor resize of the LONG side to ``target`` px,
    aspect preserved (floor, ≥1)."""
    h, w = img.shape[:2]
    scale = target / max(h, w)
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ri = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
    ci = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
    return img[ri][:, ci]


def rgb_hist_features(img: np.ndarray, bins_per_channel: int = 16) \
        -> np.ndarray:
    """Real image features: per-channel intensity histograms,
    L1-normalized, concatenated → (3 × bins,) float32."""
    width = 256 // bins_per_channel
    out = []
    for ch in range(3):
        hist = np.bincount(img[..., ch].reshape(-1) // width,
                           minlength=bins_per_channel)[:bins_per_channel]
        out.append(hist / max(hist.sum(), 1))
    return np.concatenate(out).astype(np.float32)


# ------------------------------ WAV ------------------------------- #

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV bytes → (int16 mono samples, rate). Multi-channel
    input is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n, ch, width = f.getnframes(), f.getnchannels(), f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(n)
    if width != 2:
        raise ValueError("only 16-bit PCM supported")
    data = np.frombuffer(raw, dtype="<i2")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return data.copy(), rate


def audio_features(samples: np.ndarray, rate: int,
                   n_frames: int = 16) -> np.ndarray:
    """Real audio features: per-frame RMS + zero-crossing rate over
    ``n_frames`` equal windows → (2 × n_frames,) float32."""
    x = np.asarray(samples, dtype=np.float64) / 32768.0
    if not len(x):
        return np.zeros(2 * n_frames, dtype=np.float32)
    frames = np.array_split(x, n_frames)
    rms = np.array([np.sqrt((f * f).mean()) if len(f) else 0.0
                    for f in frames])
    zcr = np.array([(np.signbit(f[1:]) != np.signbit(f[:-1])).mean()
                    if len(f) > 1 else 0.0 for f in frames])
    return np.concatenate([rms, zcr]).astype(np.float32)


# ------------------------- PPMV container ------------------------- #

_PPMV_MAGIC = b"PPMV"


def encode_ppmv(frames: list[np.ndarray], frame_ms: int = 1000) -> bytes:
    """Length-prefixed PPM frames: magic + u32 count + u32 frame_ms +
    per-frame [u32 len][P6 bytes]."""
    parts = [_PPMV_MAGIC, struct.pack("<II", len(frames), frame_ms)]
    for fr in frames:
        p = encode_ppm(fr)
        parts.append(struct.pack("<I", len(p)))
        parts.append(p)
    return b"".join(parts)


def decode_ppmv(payload: bytes) -> tuple[list[np.ndarray], int]:
    """→ (frames, frame_ms)."""
    if not payload.startswith(_PPMV_MAGIC):
        raise ValueError("not a PPMV payload")
    n, frame_ms = struct.unpack_from("<II", payload, 4)
    pos, frames = 12, []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        frames.append(decode_ppm(payload[pos:pos + ln]))
        pos += ln
    return frames, int(frame_ms)


def sniff_kind(payload: bytes) -> str | None:
    """Magic-byte detection for the natively-decodable formats."""
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(_PPMV_MAGIC):
        return "ppmv"
    return None
