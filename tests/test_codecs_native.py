"""Native media codecs (PPM/WAV/PPMV) and the multimodal stages'
REAL end-to-end paths over them — no PIL/ffmpeg involved."""

import numpy as np
import pytest

import ray

from baram_ray import codecs, multimodal


def test_ppm_roundtrip_and_resize():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (33, 21, 3), dtype=np.uint8)
    assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
    r = codecs.resize_nearest(img, 16)
    assert max(r.shape[:2]) == 16 and r.shape[2] == 3
    # nearest-neighbor: every output pixel exists in the input
    assert set(map(tuple, r.reshape(-1, 3))) <= \
        set(map(tuple, img.reshape(-1, 3)))
    # comment-tolerant header
    with_comment = b"P6\n# c\n21 33\n255\n" + img.tobytes()
    assert (codecs.decode_ppm(with_comment) == img).all()
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"\x89PNG....")


def test_wav_roundtrip_and_features():
    rng = np.random.RandomState(2)
    s = (rng.randn(1600) * 5000).astype(np.int16)
    d, rate = codecs.decode_wav(codecs.encode_wav(s, 16000))
    assert rate == 16000 and (d == s).all()
    f = codecs.audio_features(d, rate, n_frames=8)
    assert f.shape == (16,) and f[:8].max() > 0


def test_ppmv_roundtrip():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (6, 9, 3), dtype=np.uint8)
              for _ in range(4)]
    got, ms = codecs.decode_ppmv(codecs.encode_ppmv(frames, 250))
    assert ms == 250 and len(got) == 4
    assert all((a == b).all() for a, b in zip(got, frames))


def test_stages_native_end_to_end(ray_session):
    """Decode → resize → features → frame-sample over REAL payloads
    through actual map_batches actor pools."""
    t = multimodal.synth_media_table(24, seed=5, real_payloads=True)
    ds = ray.data.from_arrow(t)

    dec = ds.map_batches(multimodal.DecodeStage,
                         fn_constructor_kwargs={"real_decode": True},
                         batch_format="pyarrow", concurrency=2,
                         batch_size=8).to_pandas()
    assert len(dec) == 24 and dec["ok"].all()
    # image dims come from actual pixels (match the synth metadata)
    src = t.to_pandas()
    img = dec[dec["kind"] == "image"].merge(
        src[["item_id", "width", "height"]], on="item_id")
    assert (img["decoded_width"] == img["width"]).all()
    assert (img["decoded_height"] == img["height"]).all()
    vid = dec[dec["kind"] == "video"]
    assert (vid["n_frames"] >= 2).all()

    # real resize over image payloads only
    imgs = ds.filter(lambda r: r["kind"] == "image")
    res = imgs.map_batches(multimodal.ResizeStage,
                           fn_constructor_kwargs={"target": 16,
                                                  "real_resize": True},
                           batch_format="pyarrow",
                           concurrency=2).to_pandas()
    assert (np.maximum(res["out_width"], res["out_height"]) <= 16).all()
    for p in res["payload"]:
        im = codecs.decode_ppm(p)
        assert max(im.shape[:2]) <= 16

    # real features for every modality
    feats = ds.map_batches(multimodal.FeatureStage,
                           fn_constructor_kwargs={"dim": 48,
                                                  "real_model": True},
                           batch_format="pyarrow",
                           concurrency=2).to_pandas()
    assert len(feats) == 24
    assert all(len(v) == 48 for v in feats["feature"])
    assert any(np.asarray(v).max() > 0 for v in feats["feature"])

    # real frame extraction from the PPMV container
    frames = ds.map_batches(
        multimodal.FrameSampleStage,
        fn_constructor_kwargs={"every_ms": 1000, "decode_frames": True},
        batch_format="pyarrow", concurrency=2).to_pandas()
    n_videos = int((src["kind"] == "video").sum())
    assert frames["item_id"].nunique() == n_videos
    for p in frames["frame_payload"].head(3):
        assert codecs.decode_ppm(p).shape == (12, 16, 3)


def test_compressed_codecs_still_raise(ray_session):
    st = multimodal.DecodeStage(real_decode=True)
    with pytest.raises(NotImplementedError):
        st._decode_one("image", b"\x89PNG\r\n....")
    fs = multimodal.FeatureStage(real_model=True)
    import pyarrow as pa
    bad = pa.table({"item_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"\xff\xd8\xff jpeg"],
                                        pa.binary())})
    with pytest.raises(NotImplementedError):
        fs(bad)


def test_malformed_magic_falls_back_to_fake(ray_session):
    """A payload that merely STARTS with P6/RIFF magic but is malformed
    must fall through to the deterministic fake when real_decode=False
    (round-4 ADVICE fix) — and still raise when real_decode=True."""
    bad_ppm = b"P6 not actually a pixmap"
    bad_wav = b"RIFF....WAVEgarbage"
    st = multimodal.DecodeStage(real_decode=False)
    for payload in (bad_ppm, bad_wav):
        out = st._decode_one("image", payload)
        assert out["ok"] is True          # fake path: deterministic props
        assert out["decoded_width"] >= 16
    st_real = multimodal.DecodeStage(real_decode=True)
    with pytest.raises(Exception):
        st_real._decode_one("image", bad_ppm)
