"""Alert conditions (reference src/notifications/conditions.rs): helper
parity with the reference's description/validate semantics + windowed
evaluation over the events table."""

import numpy as np
import pandas as pd
import pytest

from baram_ray.alerts import (Custom, EntitySurge, ErrorRateThreshold,
                              KeywordSpike, ThroughputDrop, VolumeAnomaly,
                              evaluate_alerts)

SF = "/root/testdata/sf0.001"


def test_descriptions_match_reference_format():
    # conditions.rs:158-260 format strings
    ks = KeywordSpike("경제위기", 10, 60)
    assert ks.description() == \
        "Keyword '경제위기' appears >10 times in 60min window"
    assert ks.korean_description() == \
        "키워드 '경제위기'가 60분 내 10회 이상 출현"
    assert ks.condition_type() == "keyword_spike" and ks.window() == 60

    es = EntitySurge("삼성전자", 20, 30)
    assert es.description() == \
        "Entity '삼성전자' mentioned >20 times in 30min window"
    assert es.condition_type() == "entity_surge" and es.window() == 30

    va = VolumeAnomaly("politics", 2.0)
    assert va.description() == \
        "Article volume in 'politics' exceeds 2.0σ from mean"
    assert va.window() is None

    er = ErrorRateThreshold(10.0, 15)
    assert er.description() == "Error rate >10.0% in 15min window"
    td = ThroughputDrop(5.0, 10)
    assert td.description() == \
        "Throughput <5.0 articles/min in 10min window"
    c = Custom("duplicate_detection", "High duplicate article rate")
    assert c.description() == \
        "duplicate_detection: High duplicate article rate"


def test_validate_matches_reference_rules():
    # conditions.rs:282-518 validation messages
    assert KeywordSpike("", 10, 60).validate() == "Keyword cannot be empty"
    assert KeywordSpike("k", 0, 60).validate() == \
        "Threshold must be greater than 0"
    assert KeywordSpike("k", 1, 0).validate() == \
        "Window minutes must be greater than 0"
    assert EntitySurge("", 1, 1).validate() == "Entity cannot be empty"
    assert VolumeAnomaly("c", 0.0).validate() == \
        "Threshold stddev must be greater than 0"
    assert ErrorRateThreshold(120.0, 10).validate() == \
        "Threshold percent must be between 0 and 100"
    assert ThroughputDrop(0.0, 10).validate() == \
        "Threshold per minute must be greater than 0"
    assert KeywordSpike("k", 1, 1).validate() is None
    # evaluate_alerts raises on invalid conditions
    import ray
    with pytest.raises(ValueError, match="Keyword cannot be empty"):
        evaluate_alerts(ray.data.from_items([{"ts": 0}]),
                        [KeywordSpike("", 1, 1)])


def test_evaluation_window_semantics(ray_session):
    """Hand-built stream: 4 'x' events inside one hour-window, 1 in the
    next; threshold 3 must trigger exactly the first window."""
    import ray
    base = pd.Timestamp("2024-06-01 10:00:00")
    rows = [{"ts": base + pd.Timedelta(minutes=m), "event_type": "x"}
            for m in (1, 2, 3, 40)]          # window 10:00
    rows.append({"ts": base + pd.Timedelta(minutes=70),
                 "event_type": "x"})          # window 11:00
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = evaluate_alerts(ds, [KeywordSpike("x", 3, 60)], num_buckets=2)
    assert len(out) == 1
    assert out.loc[0, "observed"] == 4.0
    assert out.loc[0, "window_start_s"] == int(base.timestamp())
    # entity surge keyed on user_id follows the same windows
    rows2 = pd.DataFrame({"ts": [base] * 3, "event_type": ["a"] * 3,
                          "user_id": [7, 7, 7]})
    out2 = evaluate_alerts(ray.data.from_pandas(rows2),
                           [EntitySurge("7", 3, 60)], num_buckets=2)
    assert len(out2) == 1 and out2.loc[0, "condition_type"] == "entity_surge"


def test_alerts_pipeline_triggers(ray_session):
    from baram_ray.pipelines.events import alerts
    out = alerts(SF)
    assert set(out.columns) == {"condition_type", "description",
                                "window_start_s", "observed", "threshold"}
    # the bounded sf0.001 stream must produce at least the throughput
    # alerts (≈1.4 events/hour << 0.2/min) and some error-rate windows
    types = set(out["condition_type"])
    assert "throughput_drop" in types
    assert out["window_start_s"].dtype == np.int64
    assert out["observed"].dtype == np.float64


# ------------------------------------------------------------------ #
# Alert lifecycle + manager (reference mod.rs / manager.rs own tests)
# ------------------------------------------------------------------ #

class _Clock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def test_severity_and_status_strings():
    # mod.rs tests: as_str / korean / emoji
    from baram_ray.alerts import AlertSeverity, AlertStatus
    assert (AlertSeverity.INFO, AlertSeverity.WARNING,
            AlertSeverity.CRITICAL) == ("info", "warning", "critical")
    assert AlertSeverity.korean_desc("info") == "정보"
    assert AlertSeverity.korean_desc("warning") == "경고"
    assert AlertSeverity.korean_desc("critical") == "긴급"
    assert AlertSeverity.emoji("critical") == "🚨"
    assert (AlertStatus.CREATED, AlertStatus.TRIGGERED,
            AlertStatus.ACKNOWLEDGED, AlertStatus.RESOLVED) == \
        ("created", "triggered", "acknowledged", "resolved")


def test_alert_creation_and_dedup():
    # manager.rs:191-213
    from baram_ray.alerts import AlertSeverity, NotificationManager
    clk = _Clock()
    m = NotificationManager(clock=clk).with_dedup_window(5)
    cond = KeywordSpike("test", 10, 60)
    a1 = m.create_alert(cond, AlertSeverity.WARNING, "Test alert")
    assert a1 is not None
    # duplicate inside the window → None
    clk.t += 4 * 60
    assert m.create_alert(cond, AlertSeverity.WARNING, "Test alert") is None
    # after the window it fires again
    clk.t += 2 * 60
    assert m.create_alert(cond, AlertSeverity.WARNING, "Again") is not None
    # a DIFFERENT condition key is never deduplicated against the first
    assert m.create_alert(KeywordSpike("other", 1, 1),
                          AlertSeverity.INFO, "x") is not None


def test_alert_lifecycle():
    # manager.rs:215-245
    from baram_ray.alerts import (AlertSeverity, AlertStatus,
                                  NotificationManager)
    m = NotificationManager(clock=_Clock())
    a = m.create_alert(VolumeAnomaly("test", 2.0), AlertSeverity.INFO, "Test")
    assert a.status == AlertStatus.CREATED and not a.is_active()
    m.trigger_alert(a.id)
    assert m.get_alert(a.id).is_active()
    assert m.active_alerts() == [a]
    m.acknowledge_alert(a.id, "admin")
    assert m.get_alert(a.id).status == AlertStatus.ACKNOWLEDGED
    m.resolve_alert(a.id)
    assert m.get_alert(a.id).status == AlertStatus.RESOLVED
    with pytest.raises(KeyError):
        m.trigger_alert("nope")
    # cleanup keeps unresolved, drops old-resolved
    m2 = NotificationManager(clock=_Clock(10_000_000.0))
    old = m2.create_alert(KeywordSpike("a", 1, 1), "info", "old")
    m2.resolve_alert(old.id)
    m2._clock.t += 48 * 3600
    keep = m2.create_alert(KeywordSpike("b", 1, 1), "info", "keep")
    m2.cleanup_old_alerts(24)
    assert m2.get_alert(old.id) is None and m2.get_alert(keep.id) is not None


def test_channel_fanout_and_format(tmp_path):
    from baram_ray.alerts import (AlertSeverity, FileChannel,
                                  NotificationManager, WebhookChannel)
    import json
    with pytest.raises(NotImplementedError):
        WebhookChannel("http://example.com/hook")   # honestly stubbed
    path = str(tmp_path / "alerts.jsonl")
    m = NotificationManager(clock=_Clock())
    m.add_channel(FileChannel(path))

    class Boom:
        def send(self, alert):
            raise RuntimeError("down")

    m.add_channel(Boom())                           # error is non-fatal
    a = m.alert(KeywordSpike("k", 2, 30), AlertSeverity.CRITICAL, "spike!")
    assert a is not None and a.is_active()
    rec = json.loads(open(path).read().strip())
    assert rec["condition_type"] == "keyword_spike"
    assert rec["severity"] == "critical" and rec["status"] == "triggered"
    msg = a.format_message()
    assert msg.startswith("[CRITICAL] spike!\nCondition: Keyword 'k' ")
    assert "Status: triggered" in msg and "UTC" in msg


def test_source_failure_condition_helpers():
    # conditions.rs:448-456, :347-357
    from baram_ray.alerts import SourceFailure
    sf = SourceFailure("naver.com", 5)
    assert sf.description() == \
        "Source 'naver.com' failed 5 consecutive times"
    assert sf.korean_description() == "소스 'naver.com' 연속 5회 실패"
    assert sf.condition_type() == "source_failure" and sf.window() is None
    assert SourceFailure("", 5).validate() == "Source cannot be empty"
    assert SourceFailure("s", 0).validate() == \
        "Failure count must be greater than 0"


def test_source_failure_runs_islands(ray_session):
    """Hand-built stream: source 1 has runs [err,err,err] then ok then
    [err,err]; source 2 all ok. min_len=2 reports runs of 3 and 2."""
    import ray
    base = pd.Timestamp("2024-06-01 00:00:00")
    rows = []
    seq = [(1, "error"), (1, "error"), (1, "error"), (1, "view"),
           (1, "error"), (1, "error"), (2, "view"), (2, "view")]
    for i, (uid, et) in enumerate(seq):
        rows.append({"ts": base + pd.Timedelta(minutes=i),
                     "user_id": uid, "event_type": et})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    from baram_ray.alerts import source_failure_runs
    runs = source_failure_runs(ds, min_len=2, num_buckets=2)
    assert runs["run_len"].tolist() == [3, 2]
    assert (runs["source"] == 1).all()
    assert runs["run_start_s"].iloc[0] == int(base.timestamp())
    # min_len filters
    assert source_failure_runs(ds, min_len=3,
                               num_buckets=2)["run_len"].tolist() == [3]


def test_source_failure_in_evaluate_alerts(ray_session):
    import ray
    from baram_ray.alerts import SourceFailure, evaluate_alerts
    base = pd.Timestamp("2024-06-01 00:00:00")
    rows = [{"ts": base + pd.Timedelta(minutes=i), "user_id": 9,
             "event_type": "error"} for i in range(4)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = evaluate_alerts(ds, [SourceFailure("9", 3),
                               SourceFailure("8", 1)], num_buckets=2)
    hit = out[out["condition_type"] == "source_failure"]
    assert len(hit) == 1                         # only source 9 triggers
    assert hit.iloc[0]["observed"] == 4.0 and hit.iloc[0]["threshold"] == 3.0


def test_forecast_holt_recomputation(ray_session):
    """Independent recomputation of the Holt recursion from the raw
    daily counts equals the pipeline's forecasts bit-for-bit."""
    import numpy as np
    import pandas as pd
    from baram_ray.pipelines.events import forecast_holt
    sf = "/root/testdata/sf0.001"
    got = forecast_holt(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "ts"])
    for et, g in ev.groupby("event_type"):
        days = g["ts"].to_numpy("datetime64[D]").astype(np.int64)
        lo, hi = int(days.min()), int(days.max())
        series = np.zeros(hi - lo + 1)
        np.add.at(series, days - lo, 1.0)
        level, trend = series[0], series[1] - series[0]
        for y in series[1:]:
            prev = level
            level = 0.5 * y + 0.5 * (level + trend)
            trend = 0.3 * (level - prev) + 0.7 * trend
        sub = got[got["event_type"] == et].sort_values("day")
        assert len(sub) == 7
        for h, (_, row) in enumerate(sub.iterrows(), 1):
            assert row["day"] == hi + h
            assert row["forecast"] == round(level + h * trend, 6)
