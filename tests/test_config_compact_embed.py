"""Config surface (reference src/config/mod.rs), segment compaction,
and the M16 embedding stages."""

import os

import numpy as np
import pytest

import ray

from baram_ray.config import EngineConfig, load_config

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ #
# config: defaults < TOML < env
# ------------------------------------------------------------------ #

def test_config_defaults_and_toml(tmp_path):
    cfg = load_config()
    assert cfg.query.k == 10 and cfg.query.title_boost == 2.0
    p = tmp_path / "baram.toml"
    p.write_text("""
[index]
fields = ["text"]
k1 = 0.9
on_duplicate = "first"

[query]
k = 25
""")
    cfg = load_config(str(p))
    assert cfg.index.fields == ("text",)
    assert cfg.index.k1 == 0.9
    assert cfg.query.k == 25
    ic = cfg.index_config()
    assert ic.fields == ("text",) and ic.on_duplicate == "first"


def test_config_env_overrides(tmp_path, monkeypatch):
    monkeypatch.setenv("BARAM_RAY_QUERY_K", "33")
    monkeypatch.setenv("BARAM_RAY_INDEX_FIELDS", "content,path")
    monkeypatch.setenv("BARAM_RAY_RUNTIME_QUERY_CONCURRENCY", "8")
    cfg = load_config()
    assert cfg.query.k == 33
    assert cfg.index.fields == ("content", "path")
    assert cfg.runtime.query_concurrency == 8


def test_config_rejects_unknown(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[nosuch]\nx = 1\n")
    with pytest.raises(ValueError):
        load_config(str(p))
    p.write_text("[query]\nnope = 1\n")
    with pytest.raises(ValueError):
        load_config(str(p))


# ------------------------------------------------------------------ #
# segment compaction: file count drops, queries identical
# ------------------------------------------------------------------ #

def test_compact_preserves_queries(ray_session, tmp_path):
    from baram_ray.index.build import IndexConfig, build_index_incremental
    from baram_ray.index.compact import compact_segments
    from baram_ray.query.engine import QueryEngine
    from tests.test_incremental_build import _write_part

    d = tmp_path / "data"
    d.mkdir()
    _write_part(str(d / "p0.parquet"), 0, 100, seed=4)
    _write_part(str(d / "p1.parquet"), 100, 200, seed=5)
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang",))
    idx = str(tmp_path / "idx")
    build_index_incremental([str(d / "p0.parquet")], idx, cfg)
    build_index_incremental([str(d / "p0.parquet"),
                             str(d / "p1.parquet")], idx, cfg)

    before = {q: QueryEngine(idx).search(q, k=50)
              for q in ("data stream", "join sort", "hash table")}
    stats = compact_segments(idx, target_mb=64)
    assert stats["files_after"] < stats["files_before"]
    eng = QueryEngine(idx)
    for q, hits in before.items():
        assert eng.search(q, k=50) == hits
        assert eng.search(q, k=50, algorithm="wand") == hits[:50]


# ------------------------------------------------------------------ #
# M16 embedding stages
# ------------------------------------------------------------------ #

def test_prep_text_truncation():
    from baram_ray.stages.embed import prep_text
    s, n = prep_text("Title", "a b c")
    assert s == "Title a b c" and n == 4
    s, n = prep_text(None, " ".join(str(i) for i in range(600)))
    assert n == 512 and s.split()[-1] == "511"
    assert prep_text(None, "") == ("", 0)


def test_embed_stage_deterministic_and_stubbed():
    import pyarrow as pa
    from baram_ray.stages.embed import EMBED_DIM, EmbedStage
    with pytest.raises(NotImplementedError):
        EmbedStage(real_model=True)
    st1, st2 = EmbedStage(), EmbedStage()
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "embed_text": pa.array(["hello world", "other text"])})
    o1, o2 = st1(t), st2(t)
    assert o1.equals(o2)                        # actor-independent
    v = np.asarray(o1["embedding"].to_pylist()[0])
    assert len(v) == EMBED_DIM
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5  # normalized
    # different text -> different vector
    v2 = np.asarray(o1["embedding"].to_pylist()[1])
    assert not np.allclose(v, v2)


def test_doc_embed_pipeline(ray_session):
    from baram_ray.pipelines.training import doc_embed_vectors
    out = doc_embed_vectors(SF).to_pandas()
    assert set(out.columns) == {"doc_id", "dim", "norm"}
    assert (out["dim"] == 384).all()
    assert ((out["norm"] - 1.0).abs() < 1e-3).all()


# ------------------------------------------------------------------ #
# A5: query result cache (reference src/cache/mod.rs)
# ------------------------------------------------------------------ #

def test_ttl_cache_semantics():
    from baram_ray.query.cache import TTLCache
    t = [0.0]
    c = TTLCache(max_entries=2, ttl_s=10.0, clock=lambda: t[0])
    assert c.get("missing") is None
    # LRU eviction: a get() refreshes recency, the stale key is evicted
    c.put("x", 1)
    c.put("y", 2)
    c.get("x")                         # x most-recent → y is the LRU
    c.put("z", 3)
    assert c.get("y") is None and c.get("x") == 1 and c.get("z") == 3
    # TTL expiry
    c.put("w", 9)
    t[0] = 11.0
    assert c.get("w") is None
    assert 0 < c.hit_rate() < 1


def test_caching_query_engine():
    from baram_ray.query.cache import CachingQueryEngine

    class Fake:
        def __init__(self):
            self.calls = 0
        def search(self, query, k=10, **kw):
            self.calls += 1
            return [(1, 0.5)]

    f = Fake()
    eng = CachingQueryEngine(f)
    r1 = eng.search("q", k=5, filters={"lang": "en"})
    r2 = eng.search("q", k=5, filters={"lang": "en"})
    assert r1 == r2 == [(1, 0.5)] and f.calls == 1       # cached
    eng.search("q", k=6, filters={"lang": "en"})
    assert f.calls == 2                                  # k in the key
    eng.search("q", k=5, filters={"n_chars": {"gte": 1}})
    assert f.calls == 3                                  # range filter keyed
    assert eng.invalidate() >= 1
    eng.search("q", k=5, filters={"lang": "en"})
    assert f.calls == 4                                  # invalidated


def test_injected_model_callables_bypass_stubs(ray_session):
    """Round-2 verdict #6: a user-supplied callable slots into the
    stages' real-model branch without editing library code — exercised
    through the actual map_batches actor-pool plumbing."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from baram_ray.multimodal import (DecodeStage, FeatureStage,
                                      synth_media_table)
    from baram_ray.stages.embed import EmbedStage

    # EmbedStage with an injected batched encoder
    def fake_real_encoder(texts):
        return np.stack([np.full(8, float(len(t)), dtype=np.float32)
                         for t in texts])

    ds = ray.data.from_items([{"doc_id": 1, "embed_text": "ab"},
                              {"doc_id": 2, "embed_text": "abcd"}])
    out = ds.map_batches(
        EmbedStage, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"real_model": True, "dim": 8,
                               "encode_fn": fake_real_encoder}).to_pandas()
    got = {int(r.doc_id): list(r.embedding) for r in out.itertuples()}
    assert got[1] == [2.0] * 8 and got[2] == [4.0] * 8

    # DecodeStage with an injected per-item decoder
    import hashlib

    def fake_decoder(kind, payload):
        return {"ok": True, "decoded_width": 1, "decoded_height": 2,
                "n_frames": 3,
                "payload_sha256": hashlib.sha256(payload).hexdigest()}

    media = ray.data.from_arrow(synth_media_table(6, seed=3))
    dec = media.map_batches(
        DecodeStage, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"real_decode": True,
                               "decode_fn": fake_decoder}).to_pandas()
    assert len(dec) == 6
    assert (dec["n_frames"] == 3).all() and (dec["decoded_width"] == 1).all()

    # FeatureStage with an injected batched extractor
    def fake_features(payloads):
        return np.stack([np.full(4, float(len(p) % 7), dtype=np.float32)
                         for p in payloads])

    feats = media.map_batches(
        FeatureStage, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"dim": 4, "real_model": True,
                               "feature_fn": fake_features}).to_pandas()
    assert len(feats) == 6 and all(len(v) == 4 for v in feats["feature"])

    # the stub still raises when nothing is injected
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        EmbedStage(real_model=True)
    with _pytest.raises(NotImplementedError):
        DecodeStage(real_decode=True)._decode_one("image", b"x")
    with _pytest.raises(NotImplementedError):
        FeatureStage(real_model=True)(pa.table(
            {"item_id": pa.array([1], pa.int64()),
             "payload": pa.array([b"x"], pa.binary())}))
