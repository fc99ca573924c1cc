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
