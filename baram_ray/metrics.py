"""Pipeline metrics with Prometheus text exposition — the reference's
``metrics`` module (``src/metrics/mod.rs``) re-shaped for the batch
engine (G11/G12).

The reference registers coordinator/crawler Prometheus metrics
(counters, gauges, label-vec variants, histograms) once at startup and
turns every recording call into a NO-OP when registration failed
(``mod.rs:82-200``) — callers never crash on metrics. Here the same
surface is a small in-process registry (Ray's scheduler replaces the
coordinator, so the coordinator gauges have no analogue): Counter /
Gauge / Histogram with optional labels, idempotent ``init_metrics``,
no-op recording against an unregistered name, and ``render()`` in the
Prometheus text exposition format the reference's ``TextEncoder``
emits.

``export_index_metrics`` bridges the engine's EXISTING persisted
metrics — the per-stage build manifests (``state/checkpoint.py``) and
``meta.json`` — into that exposition format, so a scrape of an index
directory reports the same stage durations / row counts the reference
exposes over ``/metrics``.
"""

from __future__ import annotations

import json
import os

_DEFAULT_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5,
                    1.0, 2.5, 5.0, 10.0)


def _fmt_labels(labels: dict) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


def _fmt_val(v: float) -> str:
    return repr(int(v)) if float(v).is_integer() else repr(float(v))


class Counter:
    """Monotonic counter, optional labels (CounterVec when labelled)."""

    def __init__(self, name: str, help_text: str):
        self.name, self.help = name, help_text
        self.values: dict[tuple, float] = {}

    def inc(self, amount: float = 1.0, **labels) -> None:
        key = tuple(sorted(labels.items()))
        self.values[key] = self.values.get(key, 0.0) + amount

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}",
               f"# TYPE {self.name} counter"]
        for key, v in sorted(self.values.items()):
            out.append(f"{self.name}{_fmt_labels(dict(key))} {_fmt_val(v)}")
        if not self.values:
            out.append(f"{self.name} 0")
        return out


class Gauge:
    """Set-to-value gauge, optional labels."""

    def __init__(self, name: str, help_text: str):
        self.name, self.help = name, help_text
        self.values: dict[tuple, float] = {}

    def set(self, value: float, **labels) -> None:
        self.values[tuple(sorted(labels.items()))] = float(value)

    def inc(self, amount: float = 1.0, **labels) -> None:
        key = tuple(sorted(labels.items()))
        self.values[key] = self.values.get(key, 0.0) + amount

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}",
               f"# TYPE {self.name} gauge"]
        for key, v in sorted(self.values.items()):
            out.append(f"{self.name}{_fmt_labels(dict(key))} {_fmt_val(v)}")
        if not self.values:
            out.append(f"{self.name} 0")
        return out


class Histogram:
    """Cumulative-bucket histogram (Prometheus semantics: each ``le``
    bucket counts observations ≤ its bound, +Inf counts all)."""

    def __init__(self, name: str, help_text: str,
                 buckets: tuple = _DEFAULT_BUCKETS):
        self.name, self.help = name, help_text
        self.buckets = tuple(sorted(buckets))
        self.obs: dict[tuple, list[float]] = {}

    def observe(self, value: float, **labels) -> None:
        self.obs.setdefault(tuple(sorted(labels.items())),
                            []).append(float(value))

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}",
               f"# TYPE {self.name} histogram"]
        for key, vals in sorted(self.obs.items()):
            base = dict(key)
            for b in self.buckets:
                n = sum(1 for v in vals if v <= b)
                out.append(f"{self.name}_bucket"
                           f"{_fmt_labels({**base, 'le': _fmt_val(b)})} {n}")
            out.append(f"{self.name}_bucket"
                       f"{_fmt_labels({**base, 'le': '+Inf'})} {len(vals)}")
            out.append(f"{self.name}_sum{_fmt_labels(base)} "
                       f"{_fmt_val(sum(vals))}")
            out.append(f"{self.name}_count{_fmt_labels(base)} {len(vals)}")
        return out


class MetricsRegistry:
    """Named metric store; recording against an unregistered name is a
    silent no-op (the reference's failed-init fallback semantics)."""

    def __init__(self):
        self._metrics: dict[str, object] = {}

    def counter(self, name: str, help_text: str = "") -> Counter:
        return self._metrics.setdefault(name, Counter(name, help_text))

    def gauge(self, name: str, help_text: str = "") -> Gauge:
        return self._metrics.setdefault(name, Gauge(name, help_text))

    def histogram(self, name: str, help_text: str = "",
                  buckets: tuple = _DEFAULT_BUCKETS) -> Histogram:
        return self._metrics.setdefault(
            name, Histogram(name, help_text, buckets))

    # no-op recording surface (mod.rs: metrics become no-ops on failure)
    def inc(self, name: str, amount: float = 1.0, **labels) -> None:
        m = self._metrics.get(name)
        if isinstance(m, (Counter, Gauge)):
            m.inc(amount, **labels)

    def set(self, name: str, value: float, **labels) -> None:
        m = self._metrics.get(name)
        if isinstance(m, Gauge):
            m.set(value, **labels)

    def observe(self, name: str, value: float, **labels) -> None:
        m = self._metrics.get(name)
        if isinstance(m, Histogram):
            m.observe(value, **labels)

    def render(self) -> str:
        lines: list[str] = []
        for name in sorted(self._metrics):
            lines.extend(self._metrics[name].render())
        return "\n".join(lines) + "\n"


_GLOBAL: MetricsRegistry | None = None


def init_metrics() -> MetricsRegistry:
    """Idempotent global-registry init (mod.rs:82-93)."""
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = MetricsRegistry()
    return _GLOBAL


def registry() -> MetricsRegistry:
    return init_metrics()


def export_index_metrics(index_dir: str) -> str:
    """Render an index directory's persisted build metrics (stage
    manifests + meta.json) in Prometheus text format — the engine's
    ``/metrics`` equivalent for a completed build."""
    reg = MetricsRegistry()
    secs = reg.gauge("baram_ray_stage_seconds",
                     "Wall seconds per build stage")
    rows = reg.gauge("baram_ray_stage_rows", "Output rows per build stage")
    mdir = os.path.join(index_dir, "_manifests")
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            stage = m.get("stage", f[:-5])
            if "seconds" in m:
                secs.set(float(m["seconds"]), stage=stage)
            for k, v in m.items():
                if k.startswith("n_") and isinstance(v, (int, float)):
                    rows.set(float(v), stage=stage, kind=k[2:])
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        g = reg.gauge("baram_ray_index_info", "Index-level stats")
        for k in ("n_docs", "n_terms", "num_shards"):
            if k in meta:
                g.set(float(meta[k]), stat=k)
    return reg.render()
