"""Metrics registry + Prometheus text exposition (reference
src/metrics/mod.rs semantics: idempotent init, no-op on unregistered,
TextEncoder-compatible output)."""

import os

from baram_ray.metrics import (Counter, Gauge, Histogram, MetricsRegistry,
                               export_index_metrics, init_metrics)


def test_counter_gauge_render():
    reg = MetricsRegistry()
    c = reg.counter("baram_articles_total", "Articles processed")
    c.inc()
    c.inc(2, category="politics")
    g = reg.gauge("baram_online_instances", "Online instances")
    g.set(3)
    text = reg.render()
    assert "# HELP baram_articles_total Articles processed" in text
    assert "# TYPE baram_articles_total counter" in text
    assert "baram_articles_total 1" in text
    assert 'baram_articles_total{category="politics"} 2' in text
    assert "baram_online_instances 3" in text


def test_histogram_cumulative_buckets():
    reg = MetricsRegistry()
    h = reg.histogram("baram_crawl_duration_seconds", "Crawl time",
                      buckets=(0.1, 1.0, 10.0))
    for v in (0.05, 0.5, 5.0, 50.0):
        h.observe(v, category="econ")
    text = reg.render()
    assert 'baram_crawl_duration_seconds_bucket{category="econ",le="0.1"} 1' in text
    assert 'baram_crawl_duration_seconds_bucket{category="econ",le="1"} 2' in text
    assert 'baram_crawl_duration_seconds_bucket{category="econ",le="10"} 3' in text
    assert 'baram_crawl_duration_seconds_bucket{category="econ",le="+Inf"} 4' in text
    assert 'baram_crawl_duration_seconds_sum{category="econ"} 55.55' in text
    assert 'baram_crawl_duration_seconds_count{category="econ"} 4' in text


def test_noop_on_unregistered_and_idempotent_init():
    reg = MetricsRegistry()
    reg.inc("never_registered")                 # silently ignored
    reg.set("never_registered", 5.0)
    reg.observe("never_registered", 1.0)
    assert reg.render() == "\n"
    assert init_metrics() is init_metrics()     # same global registry


def test_export_index_metrics(ray_session, tmp_path):
    import shutil
    from baram_ray.index.build import IndexConfig, build_index
    out = str(tmp_path / "idx")
    shutil.rmtree(out, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=(), keep=("lang",))
    build_index("/root/testdata/sf0.001/documents.parquet", out, cfg,
                resume=False)
    text = export_index_metrics(out)
    assert 'baram_ray_stage_seconds{stage="forward"}' in text
    assert 'baram_ray_stage_seconds{stage="segments"}' in text
    assert 'baram_ray_index_info{stat="n_docs"} 500' in text
    # scrape-ready: every non-comment line is `name{labels} value`
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            assert " " in line and not line.endswith(" ")
