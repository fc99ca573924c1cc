"""Alert conditions evaluated over the event stream — the reference's
notification system (``src/notifications/conditions.rs:11-518``) rebuilt
as windowed Ray Data aggregations.

The reference defines ``AlertCondition`` variants (KeywordSpike,
EntitySurge, VolumeAnomaly, ErrorRateThreshold, ThroughputDrop,
SourceFailure, Custom) with description / korean_description /
condition_type / window_minutes / validate helpers
(``conditions.rs:158-300``); its manager dedups and routes alerts but the
*evaluation* against data is the monitoring pipeline's job — here each
windowed condition becomes a per-batch partial count keyed by the
epoch-aligned tumbling window (vectorized), shrunk by the combiner inside
the bucketed exchange, then a tiny threshold filter. Thresholds use the
Korean descriptions' inclusive "이상" (≥) semantics for counts and strict
(> / <) for rates, matching each variant's English description operator.

Alert rows: (condition_type, description, window_start_s, observed,
threshold) — ``window_start_s`` is epoch seconds of the tumbling-window
start (epoch-aligned: ``floor(epoch / W) * W``), dtype-stable for the
SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from baram_ray.util import grouped_agg

_NS = 1_000_000_000


@dataclass(frozen=True)
class KeywordSpike:
    """conditions.rs:25-31: keyword appears ≥ threshold times in a
    window_minutes tumbling window (키워드 출현 빈도 급증)."""
    keyword: str
    threshold: int
    window_minutes: int

    def condition_type(self) -> str:
        return "keyword_spike"

    def description(self) -> str:
        return (f"Keyword '{self.keyword}' appears >{self.threshold} "
                f"times in {self.window_minutes}min window")

    def korean_description(self) -> str:
        return (f"키워드 '{self.keyword}'가 {self.window_minutes}분 내 "
                f"{self.threshold}회 이상 출현")

    def window(self) -> int | None:
        return self.window_minutes

    def validate(self) -> str | None:
        if not self.keyword:
            return "Keyword cannot be empty"
        if self.threshold <= 0:
            return "Threshold must be greater than 0"
        if self.window_minutes <= 0:
            return "Window minutes must be greater than 0"
        return None


@dataclass(frozen=True)
class EntitySurge:
    """conditions.rs:46-53: an entity is mentioned ≥ threshold times in
    a window (here: keyed on any entity column, e.g. user_id)."""
    entity: str
    threshold: int
    window_minutes: int

    def condition_type(self) -> str:
        return "entity_surge"

    def description(self) -> str:
        return (f"Entity '{self.entity}' mentioned >{self.threshold} "
                f"times in {self.window_minutes}min window")

    def korean_description(self) -> str:
        return (f"개체명 '{self.entity}'가 {self.window_minutes}분 내 "
                f"{self.threshold}회 이상 언급")

    def window(self) -> int | None:
        return self.window_minutes

    def validate(self) -> str | None:
        if not self.entity:
            return "Entity cannot be empty"
        if self.threshold <= 0:
            return "Threshold must be greater than 0"
        if self.window_minutes <= 0:
            return "Window minutes must be greater than 0"
        return None


@dataclass(frozen=True)
class VolumeAnomaly:
    """conditions.rs:62-72: daily volume of a category deviates more
    than threshold_stddev σ (population) from the series mean."""
    category: str
    threshold_stddev: float

    def condition_type(self) -> str:
        return "volume_anomaly"

    def description(self) -> str:
        return (f"Article volume in '{self.category}' exceeds "
                f"{self.threshold_stddev}σ from mean")

    def korean_description(self) -> str:
        return (f"'{self.category}' 카테고리 기사량이 평균에서 "
                f"{self.threshold_stddev} 표준편차 초과")

    def window(self) -> int | None:
        return None

    def validate(self) -> str | None:
        if not self.category:
            return "Category cannot be empty"
        if self.threshold_stddev <= 0:
            return "Threshold stddev must be greater than 0"
        return None


@dataclass(frozen=True)
class ErrorRateThreshold:
    """conditions.rs:80-90: % of error events in a window exceeds
    threshold_percent."""
    threshold_percent: float
    window_minutes: int
    error_type: str = "error"

    def condition_type(self) -> str:
        return "error_rate_threshold"

    def description(self) -> str:
        return (f"Error rate >{self.threshold_percent}% in "
                f"{self.window_minutes}min window")

    def korean_description(self) -> str:
        return (f"{self.window_minutes}분 내 오류율 "
                f"{self.threshold_percent}% 초과")

    def window(self) -> int | None:
        return self.window_minutes

    def validate(self) -> str | None:
        if not (0.0 <= self.threshold_percent <= 100.0):
            return "Threshold percent must be between 0 and 100"
        if self.window_minutes <= 0:
            return "Window minutes must be greater than 0"
        return None


@dataclass(frozen=True)
class ThroughputDrop:
    """conditions.rs:97-107: events per minute in a window drops below
    threshold_per_minute."""
    threshold_per_minute: float
    window_minutes: int

    def condition_type(self) -> str:
        return "throughput_drop"

    def description(self) -> str:
        return (f"Throughput <{self.threshold_per_minute} articles/min "
                f"in {self.window_minutes}min window")

    def korean_description(self) -> str:
        return (f"{self.window_minutes}분 내 처리량이 분당 "
                f"{self.threshold_per_minute}건 미만")

    def window(self) -> int | None:
        return self.window_minutes

    def validate(self) -> str | None:
        if self.threshold_per_minute <= 0:
            return "Threshold per minute must be greater than 0"
        if self.window_minutes <= 0:
            return "Window minutes must be greater than 0"
        return None


@dataclass(frozen=True)
class SourceFailure:
    """conditions.rs:115-127: a source fails ``failure_count``
    consecutive times (run of error events with no success between)."""
    source: str
    failure_count: int

    def condition_type(self) -> str:
        return "source_failure"

    def description(self) -> str:
        return (f"Source '{self.source}' failed {self.failure_count} "
                f"consecutive times")

    def korean_description(self) -> str:
        return f"소스 '{self.source}' 연속 {self.failure_count}회 실패"

    def window(self) -> int | None:
        return None

    def validate(self) -> str | None:
        if not self.source:
            return "Source cannot be empty"
        if self.failure_count <= 0:
            return "Failure count must be greater than 0"
        return None


@dataclass(frozen=True)
class Custom:
    """conditions.rs:131-146: user-named condition; parameters only."""
    name: str
    description_text: str
    parameters: dict = field(default_factory=dict)

    def condition_type(self) -> str:
        return "custom"

    def description(self) -> str:
        return f"{self.name}: {self.description_text}"

    def korean_description(self) -> str:
        return self.description_text

    def window(self) -> int | None:
        return None

    def validate(self) -> str | None:
        if not self.name:
            return "Name cannot be empty"
        return None


# --------------------------------------------------------------------- #
# Alert lifecycle + notification manager (reference
# src/notifications/mod.rs:71-240, manager.rs:10-177)
# --------------------------------------------------------------------- #

class AlertSeverity:
    """mod.rs:71-106: info / warning / critical with korean + emoji."""
    INFO, WARNING, CRITICAL = "info", "warning", "critical"
    _KOREAN = {"info": "정보", "warning": "경고", "critical": "긴급"}
    _EMOJI = {"info": "ℹ️", "warning": "⚠️", "critical": "🚨"}

    @classmethod
    def korean_desc(cls, sev: str) -> str:
        return cls._KOREAN[sev]

    @classmethod
    def emoji(cls, sev: str) -> str:
        return cls._EMOJI[sev]


class AlertStatus:
    """mod.rs:117-142: created → triggered → acknowledged → resolved."""
    CREATED, TRIGGERED = "created", "triggered"
    ACKNOWLEDGED, RESOLVED = "acknowledged", "resolved"


class Alert:
    """mod.rs:148-240: one alert instance with lifecycle timestamps."""

    def __init__(self, condition, severity: str, message: str, *,
                 clock=None):
        import time as _time
        import uuid
        self._clock = clock or _time.time
        self.id = str(uuid.uuid4())
        self.condition = condition
        self.severity = severity
        self.status = AlertStatus.CREATED
        self.message = message
        self.metadata: dict[str, str] = {}
        self.created_at = self._clock()
        self.triggered_at = None
        self.acknowledged_at = None
        self.acknowledged_by = None
        self.resolved_at = None

    def with_metadata(self, key: str, value: str) -> "Alert":
        self.metadata[key] = value
        return self

    def trigger(self) -> None:
        self.status = AlertStatus.TRIGGERED
        self.triggered_at = self._clock()

    def acknowledge(self, acknowledged_by: str) -> None:
        self.status = AlertStatus.ACKNOWLEDGED
        self.acknowledged_at = self._clock()
        self.acknowledged_by = acknowledged_by

    def resolve(self) -> None:
        self.status = AlertStatus.RESOLVED
        self.resolved_at = self._clock()

    def is_active(self) -> bool:
        return self.status == AlertStatus.TRIGGERED

    def format_message(self) -> str:
        """mod.rs:232-240 display format."""
        import datetime
        created = datetime.datetime.fromtimestamp(
            self.created_at, datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S UTC")
        return (f"[{self.severity.upper()}] {self.message}\n"
                f"Condition: {self.condition.description()}\n"
                f"Status: {self.status}\nCreated: {created}")


class FileChannel:
    """Notification channel writing alert JSON lines to a local file —
    the testable stand-in for the reference's webhook POST
    (``channels/webhook.rs``; no network in this container, so the HTTP
    channel is honestly stubbed in :class:`WebhookChannel`)."""

    def __init__(self, path: str):
        self.path = path

    def send(self, alert: Alert) -> None:
        import json as _json
        with open(self.path, "a") as f:
            f.write(_json.dumps({
                "id": alert.id, "severity": alert.severity,
                "status": alert.status, "message": alert.message,
                "condition_type": alert.condition.condition_type(),
                "description": alert.condition.description(),
            }) + "\n")


class WebhookChannel:
    """Reference ``WebhookChannel::from_url`` (``channels/webhook.rs``):
    POSTs alert JSON to an HTTP endpoint. No network in this container —
    honestly not implemented; use :class:`FileChannel`."""

    def __init__(self, url: str):
        raise NotImplementedError(
            "no network in this environment; use FileChannel")


class NotificationManager:
    """manager.rs:10-177: orchestrates alerts — dedup by condition key
    within a time window, channel fan-out, lifecycle + cleanup. Clock is
    injectable for deterministic tests."""

    def __init__(self, *, dedup_window_minutes: int = 30, clock=None):
        import time as _time
        self._clock = clock or _time.time
        self.channels: list = []
        self.alerts: dict[str, Alert] = {}
        self.last_triggered: dict[str, float] = {}
        self.dedup_window_minutes = dedup_window_minutes

    def with_dedup_window(self, minutes: int) -> "NotificationManager":
        self.dedup_window_minutes = minutes
        return self

    def add_channel(self, channel) -> None:
        self.channels.append(channel)

    def _should_deduplicate(self, condition_key: str) -> bool:
        last = self.last_triggered.get(condition_key)
        if last is None:
            return False
        return (self._clock() - last) < self.dedup_window_minutes * 60

    def create_alert(self, condition, severity: str,
                     message: str) -> Alert | None:
        """Returns None when deduplicated (manager.rs:66-87)."""
        key = f"{condition.condition_type()}:{condition.description()}"
        if self._should_deduplicate(key):
            return None
        alert = Alert(condition, severity, message, clock=self._clock)
        self.alerts[alert.id] = alert
        self.last_triggered[key] = self._clock()
        return alert

    def trigger_alert(self, alert_id: str) -> None:
        """Mark triggered and fan out to every channel; a channel error
        is logged, not fatal (manager.rs:89-110)."""
        alert = self.alerts.get(alert_id)
        if alert is None:
            raise KeyError(f"Alert not found: {alert_id}")
        alert.trigger()
        for ch in self.channels:
            try:
                ch.send(alert)
            except Exception:                     # noqa: BLE001
                pass

    def alert(self, condition, severity: str,
              message: str) -> Alert | None:
        """Create + immediately trigger (manager.rs:113-127)."""
        a = self.create_alert(condition, severity, message)
        if a is not None:
            self.trigger_alert(a.id)
        return a

    def acknowledge_alert(self, alert_id: str, by: str) -> None:
        if alert_id not in self.alerts:
            raise KeyError(f"Alert not found: {alert_id}")
        self.alerts[alert_id].acknowledge(by)

    def resolve_alert(self, alert_id: str) -> None:
        if alert_id not in self.alerts:
            raise KeyError(f"Alert not found: {alert_id}")
        self.alerts[alert_id].resolve()

    def active_alerts(self) -> list[Alert]:
        return [a for a in self.alerts.values()
                if a.status == AlertStatus.TRIGGERED]

    def all_alerts(self) -> list[Alert]:
        return list(self.alerts.values())

    def get_alert(self, alert_id: str) -> Alert | None:
        return self.alerts.get(alert_id)

    def cleanup_old_alerts(self, older_than_hours: int) -> None:
        """Drop alerts resolved before the cutoff (manager.rs:169-177)."""
        cutoff = self._clock() - older_than_hours * 3600
        self.alerts = {k: a for k, a in self.alerts.items()
                       if a.resolved_at is None or a.resolved_at > cutoff}


# --------------------------------------------------------------------- #
# Evaluation over the events Dataset
# --------------------------------------------------------------------- #

def _window_col(ts: pd.Series, window_minutes: int) -> np.ndarray:
    """Epoch-aligned tumbling-window start in epoch seconds."""
    w = window_minutes * 60
    sec = ts.to_numpy().astype("datetime64[ns]").astype(np.int64) // _NS
    return (sec // w) * w


def _alert_frame(cond, window_start_s, observed) -> pd.DataFrame:
    return pd.DataFrame({
        "condition_type": cond.condition_type(),
        "description": cond.description(),
        "window_start_s": pd.Series(window_start_s, dtype="int64"),
        "observed": pd.Series(observed, dtype="float64"),
        "threshold": np.float64(
            getattr(cond, "threshold",
                    getattr(cond, "threshold_percent",
                            getattr(cond, "threshold_per_minute",
                            getattr(cond, "threshold_stddev",
                                    getattr(cond, "failure_count", 0.0)))))),
    })


def _windowed_specs(conditions):
    """Normalize every data-backed condition to one windowed-count spec:
    (kind, window_seconds, key filter) — EntitySurge is KeywordSpike
    keyed on the entity column; VolumeAnomaly uses daily windows."""
    specs = []
    for cond in conditions:
        if isinstance(cond, EntitySurge):
            specs.append(("count", cond.window_minutes * 60,
                          "user_id", cond.entity, cond))
        elif isinstance(cond, KeywordSpike):
            specs.append(("count", cond.window_minutes * 60,
                          None, cond.keyword, cond))
        elif isinstance(cond, ErrorRateThreshold):
            specs.append(("rate", cond.window_minutes * 60,
                          None, cond.error_type, cond))
        elif isinstance(cond, ThroughputDrop):
            specs.append(("all", cond.window_minutes * 60,
                          None, None, cond))
        elif isinstance(cond, VolumeAnomaly):
            specs.append(("count", 86400, None, cond.category, cond))
        elif isinstance(cond, SourceFailure):
            specs.append("source")              # sequential path, below
        else:                                   # Custom: no data semantics
            specs.append(None)
    return specs


def source_failure_runs(ds, min_len: int = 1, *,
                        source_col: str = "user_id",
                        error_type: str = "error",
                        num_buckets: int = 8) -> pd.DataFrame:
    """Consecutive-failure runs per source (reference SourceFailure,
    ``conditions.rs:115-127``): within each source's time-ordered event
    stream, maximal runs of ``error_type`` events with no other event
    between → (source, run_start_s, run_len), run_len ≥ ``min_len``.

    Shape: hash exchange on the source key, then a fully-vectorized
    gaps-and-islands pass per bucket (runs break at source OR error-flag
    changes) — bounded per-source state, no driver loop."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype="int64"),
            "run_start_s": pd.Series([], dtype="int64"),
            "run_len": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        df = df.sort_values([source_col, "ts"], kind="stable")
        src = df[source_col].to_numpy()
        err = (df["event_type"].astype(str) == error_type).to_numpy()
        sec = df["ts"].to_numpy().astype("datetime64[ns]"
                                         ).astype(np.int64) // _NS
        new_run = np.empty(len(df), dtype=bool)
        new_run[0] = True
        new_run[1:] = (src[1:] != src[:-1]) | (err[1:] != err[:-1])
        run_id = np.cumsum(new_run) - 1
        r = pd.DataFrame({"run": run_id[err], "source": src[err],
                          "sec": sec[err]})
        if not len(r):
            return empty
        g = r.groupby("run", as_index=False).agg(
            source=("source", "first"), run_start_s=("sec", "min"),
            run_len=("sec", "size"))
        g = g[g["run_len"] >= min_len]
        return pd.DataFrame({
            "source": g["source"].astype("int64"),
            "run_start_s": g["run_start_s"].astype("int64"),
            "run_len": g["run_len"].astype("int64")})

    from baram_ray.util import grouped_map
    out = grouped_map(ds, [source_col], bucket,
                      num_buckets=num_buckets).to_pandas()
    if "source" not in out.columns:
        # all buckets empty: Ray drops columns on an all-empty
        # to_pandas — restore the declared schema (fuzz-found: a
        # corpus with no qualifying run crashed the sort below)
        return pd.DataFrame({
            "source": pd.Series(dtype="int64"),
            "run_start_s": pd.Series(dtype="int64"),
            "run_len": pd.Series(dtype="int64")})
    return (out.sort_values(["source", "run_start_s"])
               .reset_index(drop=True))


def evaluate_alerts(ds, conditions: list, *, key_col: str = "event_type",
                    num_buckets: int = 8) -> pd.DataFrame:
    """Evaluate every condition against the events Dataset in ONE pass:
    a single map_batches emits per-batch pre-aggregated (condition,
    window) partial counts for ALL conditions (the combiner shrinks each
    block to ~windows-per-block rows per condition), one bucketed
    exchange sums them, and the tiny (conditions × windows) result is
    thresholded on the driver. Returns the union of triggered alert rows
    sorted by (condition_type, window_start_s). Invalid conditions raise
    (reference ``validate``).

    NOTE: windows with ZERO events never appear in the aggregate — a
    streaming deployment must tick empty windows; over a bounded table
    only observed windows are judged (what the SQL oracle computes too).
    """
    for cond in conditions:
        err = cond.validate()
        if err:
            raise ValueError(f"{cond.condition_type()}: {err}")
    specs = _windowed_specs(conditions)
    live = [(ci, sp) for ci, sp in enumerate(specs)
            if isinstance(sp, tuple)]
    # SourceFailure needs a sequential per-source pass — one runs table
    # (min over the requested counts) shared by every such condition
    sf_conds = [c for c in conditions if isinstance(c, SourceFailure)]
    runs = None
    if sf_conds:
        runs = source_failure_runs(
            ds, min_len=min(c.failure_count for c in sf_conds),
            num_buckets=num_buckets)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        sec = df["ts"].to_numpy().astype("datetime64[ns]"
                                         ).astype(np.int64) // _NS
        frames = []
        for ci, (kind, wsec, kcol, match, _c) in live:
            w = (sec // wsec) * wsec
            if kind == "all":
                x = np.ones(len(df), dtype=np.int64)
                n = x
            else:
                keys = df[kcol if kcol else key_col].astype(str).to_numpy()
                x = (keys == match).astype(np.int64)
                n = np.ones(len(df), dtype=np.int64)
                if kind == "count":          # pure count: drop non-matches
                    w, x, n = w[x == 1], x[x == 1], n[x == 1]
            g = pd.DataFrame({"w": w, "x": x, "n": n}).groupby(
                "w", as_index=False).sum()
            g.insert(0, "c", np.int64(ci))
            frames.append(g)
        if not frames:
            return pd.DataFrame({"c": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64"),
                                 "x": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    agg = grouped_agg(ds.map_batches(partials, batch_format="pandas"),
                      ["c", "w"], {"x": ("x", "sum"), "n": ("n", "sum")},
                      num_buckets=num_buckets).to_pandas()
    if "c" not in agg.columns:          # 0-row events table → the
        agg = pd.DataFrame({            # exchange lost the schema
            "c": pd.Series(dtype="int64"), "w": pd.Series(dtype="int64"),
            "x": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})

    frames = []
    for ci, cond in enumerate(conditions):
        sp = specs[ci]
        if sp is None:                          # Custom
            frames.append(_alert_frame(cond, np.empty(0, np.int64),
                                       np.empty(0, np.float64)))
            continue
        if sp == "source":                      # SourceFailure
            hit = runs[(runs["source"].astype(str) == cond.source)
                       & (runs["run_len"] >= cond.failure_count)]
            frames.append(_alert_frame(
                cond, hit["run_start_s"].to_numpy(),
                hit["run_len"].to_numpy().astype(np.float64)))
            continue
        g = agg[agg["c"] == ci].sort_values("w")
        w = g["w"].to_numpy()
        x = g["x"].to_numpy().astype(np.float64)
        n = g["n"].to_numpy().astype(np.float64)
        if isinstance(cond, (KeywordSpike, EntitySurge)):
            hit = x >= cond.threshold
            frames.append(_alert_frame(cond, w[hit], x[hit]))
        elif isinstance(cond, ErrorRateThreshold):
            rate = np.round(100.0 * x / n, 6)
            hit = rate > cond.threshold_percent
            frames.append(_alert_frame(cond, w[hit], rate[hit]))
        elif isinstance(cond, ThroughputDrop):
            per_min = np.round(x / cond.window_minutes, 6)
            hit = per_min < cond.threshold_per_minute
            frames.append(_alert_frame(cond, w[hit], per_min[hit]))
        elif isinstance(cond, VolumeAnomaly):
            sd = float(x.std()) if len(x) else 0.0   # population sigma
            if sd == 0.0:
                frames.append(_alert_frame(cond, np.empty(0, np.int64),
                                           np.empty(0, np.float64)))
            else:
                z = np.round((x - x.mean()) / sd, 6)
                hit = z > cond.threshold_stddev
                frames.append(_alert_frame(cond, w[hit], z[hit]))
    out = pd.concat(frames, ignore_index=True)
    return (out.sort_values(["condition_type", "window_start_s"])
               .reset_index(drop=True))
