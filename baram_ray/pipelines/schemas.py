"""Declared output schemas for possibly-empty query results.

Ray Data skips UDFs on 0-row blocks, so a pipeline over an EMPTY input
table comes back schema-less — ``to_pandas()`` yields a frame with no
columns at all, which breaks every downstream consumer that relies on
the declared result shape (the driver's schema comparison against the
SQL oracle, and any caller selecting columns). The in-pipeline fix is
``ensure_cols`` at the tail; this table centralizes the declared
(column → pandas dtype) output schema per public query so the
``queries()`` registry can apply the restoration uniformly instead of
each pipeline hand-rolling the same guard.

Dtypes mirror what the DuckDB oracle returns for the same query on an
empty table (``tests/test_differential.py::test_events_fully_empty_table``
verifies the parity end-to-end).
"""

from __future__ import annotations

TS = "datetime64[us]"

#: query name → declared output schema (column → pandas dtype), applied
#: only when the engine result comes back column-less (empty input).
EMPTY_SCHEMAS: dict[str, dict[str, str]] = {
    "events_daily_counts": {"event_type": "object", "day": TS,
                            "n": "int64"},
    "events_sma7": {"event_type": "object", "day": TS, "n": "int64",
                    "sma": "float64"},
    "events_spikes": {"event_type": "object", "day": TS, "n": "int64",
                      "zscore": "float64"},
    "events_pct_change": {"event_type": "object", "start_day": TS,
                          "end_day": TS, "start_n": "int64",
                          "end_n": "int64", "pct_change": "float64"},
    "events_sessions": {"user_id": "int64", "session_start": TS,
                        "session_end": TS, "n_events": "int64"},
    "events_session_stats": {"user_id": "int64", "n_sessions": "int64",
                             "total_events": "int64",
                             "mean_session_s": "float64"},
    "events_asof_click": {"event_id": "int64", "user_id": "int64",
                          "ts": TS, "click_ts": TS},
    "events_range_clicks": {"event_id": "int64", "ts": TS,
                            "user_id": "int64", "n_clicks_1h": "int64"},
    "events_value_median": {"event_type": "object",
                            "median_value": "float64", "n": "int64"},
    "events_value_stats": {"event_type": "object", "n": "int64",
                           "mean": "float64", "var_pop": "float64"},
    "events_alerts": {"condition_type": "object",
                      "description": "object",
                      "window_start_s": "int64", "observed": "float64",
                      "threshold": "float64"},
    "events_value_outliers_mad": {"event_type": "object", "n": "int64",
                                  "med": "float64", "mad": "float64",
                                  "n_outliers": "int64"},
    "events_user_topk": {"user_id": "int64", "n": "int64"},
    "events_topn_per_user": {"user_id": "int64", "rnk": "int64",
                             "event_id": "int64", "value": "float64"},
    "events_inter_deltas": {"user_id": "int64", "event_id": "int64",
                            "gap_sec": "float64"},
    "events_running_total": {"event_type": "object", "day": TS,
                             "n": "int64", "running_n": "int64"},
    "events_hopping_counts": {"ws": TS, "n": "int64"},
    "events_dau_wau": {"week": "int64", "wau": "int64",
                       "avg_dau": "float64", "stickiness": "float64"},
    "events_heatmap": {"dow": "int64", "hour": "int64", "n": "int64"},
    "events_transitions": {"prev_type": "object", "next_type": "object",
                           "n": "int64"},
    "events_user_lifetime": {"user_id": "int64", "first_ts": TS,
                             "last_ts": TS, "lifetime_sec": "int64",
                             "n_events": "int64"},
    "events_retention": {"cohort_week": "int64",
                         "week_offset": "int64", "users": "int64"},
    "events_distinct_kmv": {"event_type": "object",
                            "est_distinct": "float64"},
    "events_velocity": {"event_type": "object", "velocity": "float64"},
    "events_forecast_holt": {"event_type": "object", "day": "int64",
                             "forecast": "float64"},
    "events_minmax": {"event_type": "object", "day": TS, "n": "int64",
                      "norm": "float64"},
}


def with_declared_schema(name: str, fn):
    """Wrap a ``queries()`` callable so an empty result keeps its
    schema; non-empty results pass through untouched (materialized to
    pandas — every query result here is a driver-sized aggregate by
    contract).

    Two layers (deep-seed fuzz found both needed): (1)
    ``to_typed_pandas`` — Ray's ``Dataset.to_pandas()`` drops the
    schema of ANY 0-row dataset even when its blocks are fully typed,
    so every Dataset-returning entry is rebuilt from its block schema
    (no registry needed); (2) the ``EMPTY_SCHEMAS`` registry — for a
    0-row INPUT table the pipeline is schema-less all the way through
    and only the declaration can restore the contract columns."""
    cols = EMPTY_SCHEMAS.get(name)

    def wrapped(sf_dir: str, *a, **kw):
        res = fn(sf_dir, *a, **kw)
        try:
            import ray.data
            if isinstance(res, ray.data.Dataset):
                from baram_ray.util import to_typed_pandas
                res = to_typed_pandas(res)
        except ImportError:
            pass
        if cols is not None:
            from baram_ray.pipelines.util import ensure_cols
            res = ensure_cols(res, cols)
        return res

    wrapped.__name__ = getattr(fn, "__name__", name)
    wrapped.__doc__ = fn.__doc__
    return wrapped
