"""User-facing configuration (reference ``src/config/mod.rs:13-100``:
section'd config + ``BARAM_*`` env overrides + TOML file loading).

The reference's sections are crawler/database/opensearch/logging; the
Ray engine's are the analogous index/query/runtime knobs. Precedence
mirrors the reference: defaults < TOML file < environment variables
(``BARAM_RAY_*``). Python 3.11's stdlib ``tomllib`` parses the file —
no extra dependency.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, field, fields


@dataclass
class IndexSection:
    fields: tuple[str, ...] = ("content",)
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    keep: tuple[str, ...] = ("repo", "path", "lang")
    k1: float = 1.2
    b: float = 0.75
    num_shards: int | None = None
    tokenize_batch_size: int = 256
    on_duplicate: str = "error"


@dataclass
class QuerySection:
    k: int = 10                     # reference default top-k (mod.rs:163)
    max_k: int = 100                # reference k cap (mod.rs:470-507)
    title_boost: float = 2.0        # reference boost (mod.rs:470-507)
    hybrid_w_bm25: float = 0.3      # hybrid-pipeline weights
    hybrid_w_knn: float = 0.7
    min_score: float | None = None
    algorithm: str = "auto"
    page_size: int = 500            # search_after batch (engine.rs:152-280)


@dataclass
class RuntimeSection:
    query_concurrency: int = 4      # QueryActor pool size
    embed_batch: int = 50           # docs per embed call (main.rs:73-75)
    num_buckets: int | None = None  # exchange buckets (None = by bytes)
    log_level: str = "info"


@dataclass
class EngineConfig:
    index: IndexSection = field(default_factory=IndexSection)
    query: QuerySection = field(default_factory=QuerySection)
    runtime: RuntimeSection = field(default_factory=RuntimeSection)

    def index_config(self):
        """Materialize the build-side IndexConfig."""
        from baram_ray.index.build import IndexConfig
        s = self.index
        return IndexConfig(
            fields=tuple(s.fields), id_cols=tuple(s.id_cols),
            keep=tuple(s.keep), k1=s.k1, b=s.b, num_shards=s.num_shards,
            tokenize_batch_size=s.tokenize_batch_size,
            on_duplicate=s.on_duplicate)

    def to_dict(self) -> dict:
        return asdict(self)


_ENV_PREFIX = "BARAM_RAY_"


def _coerce(cur, raw: str):
    if isinstance(cur, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(cur, int):
        return int(raw)
    if isinstance(cur, float):
        return float(raw)
    if isinstance(cur, tuple):
        return tuple(x.strip() for x in raw.split(",") if x.strip())
    if cur is None:
        try:
            return int(raw)
        except ValueError:
            return raw
    return raw


def load_config(path: str | None = None) -> EngineConfig:
    """defaults < TOML < env — the reference's from_env/from_file
    precedence (``src/config/mod.rs``). Env keys:
    ``BARAM_RAY_<SECTION>_<KEY>``, e.g. ``BARAM_RAY_QUERY_K=20`` or
    ``BARAM_RAY_INDEX_FIELDS=content,path``."""
    cfg = EngineConfig()
    if path:
        import tomllib
        with open(path, "rb") as f:
            data = tomllib.load(f)
        for sec_name, sec_vals in data.items():
            sec = getattr(cfg, sec_name, None)
            if sec is None or not isinstance(sec_vals, dict):
                raise ValueError(f"unknown config section {sec_name!r}")
            for k, v in sec_vals.items():
                if not hasattr(sec, k):
                    raise ValueError(f"unknown key {sec_name}.{k}")
                if isinstance(getattr(sec, k), tuple) and isinstance(v, list):
                    v = tuple(v)
                setattr(sec, k, v)
    for sec_name in ("index", "query", "runtime"):
        sec = getattr(cfg, sec_name)
        for f_ in fields(sec):
            env = f"{_ENV_PREFIX}{sec_name.upper()}_{f_.name.upper()}"
            raw = os.environ.get(env)
            if raw is not None:
                setattr(sec, f_.name, _coerce(getattr(sec, f_.name), raw))
    return cfg
