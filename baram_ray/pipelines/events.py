"""Time-series pipelines over ``events`` — the analytics operators of the
reference (G4 moving average src/analytics/keyword_trends.rs:220-249,
G5 spike/z-score :260-302, G8 top-k :482-501) on Ray Data.

Windowing model: daily buckets per ``event_type`` (the reference's
per-keyword BTreeMap series), computed as a small groupby-aggregate, then
``groupby(key).map_groups`` over the sorted per-key series — bounded state
per group, no global materialization (ray_guide streaming-shaped pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Sum

from baram_ray.pipelines.util import read_table
from baram_ray.util import grouped_agg, grouped_map


def type_agg(sf_dir: str):
    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        # scaled-int sum: bit-identical to the SQL oracle at any sf
        # (see baram_ray.pipelines.tpch module docstring); per-batch
        # combiner keeps the exchange at ~5 rows per block
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "value_u6": np.trunc(df["value"].to_numpy() * 1000000.0 + 0.5
                                 ).astype("int64"),
        }).groupby("event_type", as_index=False).agg(
            n=("value_u6", "size"),
            total_value_u6=("value_u6", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    from baram_ray.pipelines.util import ensure_cols
    res = (ds.map_batches(partial, batch_format="pandas")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("total_value_u6", alias_name="total_value_u6")))
    return ensure_cols(res, {"event_type": "object", "n": "int64",
                             "total_value_u6": "int64"})


def _daily(sf_dir: str):
    ds = read_table(sf_dir, "events", ["event_type", "ts"])

    def day_col(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "day": df["ts"].dt.floor("D")})

    return grouped_agg(ds.map_batches(day_col, batch_format="pandas"),
                       ["event_type", "day"], {"n": (None, "count")},
                       num_buckets=16)


def daily_counts(sf_dir: str):
    return _daily(sf_dir)


def sma7(sf_dir: str):
    """7-point simple moving average per event_type (G4; window = ROWS
    6 PRECEDING .. CURRENT over the day-sorted series)."""

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        g["sma"] = g["n"].rolling(7, min_periods=1).mean().round(6)
        return g

    return _daily(sf_dir).groupby("event_type").map_groups(
        roll, batch_format="pandas")


def spikes(sf_dir: str):
    """G5: z-score of daily count vs the series mean/σ (population σ,
    matching SQL stddev_pop)."""

    def z(g: pd.DataFrame) -> pd.DataFrame:
        mu = g["n"].mean()
        sd = g["n"].std(ddof=0)
        g = g.sort_values("day")
        # zero-variance series (single day / constant counts): zscore = 0.0,
        # matching the oracle's CASE on stddev_pop = 0
        z = ((g["n"] - mu) / sd) if sd > 0 else pd.Series(0.0, index=g.index)
        g["zscore"] = z.round(6)
        return g

    return _daily(sf_dir).groupby("event_type").map_groups(
        z, batch_format="pandas")


def pct_change(sf_dir: str):
    """Percent change of the daily count between a series' endpoints —
    the reference's ``KeywordTrend::percent_change`` (G-surface,
    ``src/analytics/keyword_trends.rs:367-393``) applied per event_type
    with (start, end) = (first, last) day of the series. Zero baseline
    → 100.0 (the reference's arbitrary-high-value branch)."""

    def pc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        sn, en = int(g["n"].iloc[0]), int(g["n"].iloc[-1])
        pct = 100.0 if sn == 0 else round((en - sn) * 100.0 / sn, 6)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "start_day": [g["day"].iloc[0]],
            "end_day": [g["day"].iloc[-1]],
            "start_n": pd.Series([sn], dtype="int64"),
            "end_n": pd.Series([en], dtype="int64"),
            "pct_change": pd.Series([pct], dtype="float64"),
        })

    return _daily(sf_dir).groupby("event_type").map_groups(
        pc, batch_format="pandas")


def alerts(sf_dir: str):
    """Alert-condition evaluation over the event stream (reference
    notification system, ``src/notifications/conditions.rs``): windowed
    keyword-spike / error-rate / throughput / volume-anomaly conditions
    as tumbling-window aggregations; returns triggered alert rows.
    SQL-expressible → hash-exact DuckDB oracle."""
    from baram_ray.alerts import (ErrorRateThreshold, KeywordSpike,
                                  ThroughputDrop, VolumeAnomaly,
                                  evaluate_alerts)
    ds = read_table(sf_dir, "events", ["ts", "event_type"])
    conds = [
        KeywordSpike("click", threshold=3, window_minutes=60),
        ErrorRateThreshold(threshold_percent=25.0, window_minutes=60),
        ThroughputDrop(threshold_per_minute=0.2, window_minutes=60),
        VolumeAnomaly("error", threshold_stddev=2.0),
    ]
    return evaluate_alerts(ds, conds)


def source_failures(sf_dir: str):
    """Consecutive-failure runs per source (reference SourceFailure
    condition, ``src/notifications/conditions.rs:115-127``): maximal
    runs of ≥3 consecutive error events per user_id — vectorized
    gaps-and-islands per exchange bucket. SQL-expressible → hash-exact
    DuckDB oracle."""
    from baram_ray.alerts import source_failure_runs
    ds = read_table(sf_dir, "events", ["ts", "user_id", "event_type"])
    return source_failure_runs(ds, min_len=3)


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization per user (the standard event-pipeline
    windowing op): a new session starts when the gap to the previous
    event exceeds ``gap_minutes``. One hash exchange on user_id; inside
    each bucket the per-user history is sorted once and sessions fall
    out of a vectorized cumsum over gap breaks (gaps-and-islands, same
    shape as ``source_failures``). Partitioning assumption: one user's
    history fits a bucket — the standard sessionization contract.
    SQL-expressible (lag + windowed sum) → hash-exact oracle."""
    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype=df["user_id"].dtype
                                     if "user_id" in df else "int64"),
                "session_start": pd.Series(dtype="datetime64[ns]"),
                "session_end": pd.Series(dtype="datetime64[ns]"),
                "n_events": pd.Series(dtype="int64")})
        d = df.sort_values(["user_id", "ts", "event_id"],
                           kind="stable").reset_index(drop=True)
        new_user = d["user_id"].ne(d["user_id"].shift())
        brk = new_user | (d["ts"] - d["ts"].shift() > gap)
        d["sid"] = brk.cumsum()
        g = (d.groupby(["user_id", "sid"], as_index=False)
              .agg(session_start=("ts", "min"),
                   session_end=("ts", "max"),
                   n_events=("ts", "size")))
        g["n_events"] = g["n_events"].astype("int64")
        return g.drop(columns=["sid"])

    return grouped_map(ds, ["user_id"], bucket, num_buckets=8)


def asof_purchase_click(sf_dir: str):
    """As-of join: each purchase event gets the timestamp of the most
    recent prior-or-equal click by the same user (``joins.asof_join`` —
    cogroup on user_id + per-bucket ``merge_asof``; unmatched purchases
    keep NULL). Attaches the VALUE (click_ts), which is tie-safe when
    several clicks share the winning timestamp. Hash-exact vs DuckDB's
    native ASOF LEFT JOIN."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from baram_ray.joins import asof_join

    ds = read_table(sf_dir, "events",
                    ["event_id", "ts", "user_id", "event_type"])
    purchases = ds.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase"))
                   .drop_columns(["event_type"]),
        batch_format="pyarrow")

    def clicks_f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "click"))
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "click_ts": t["ts"]})

    clicks = ds.map_batches(clicks_f, batch_format="pyarrow")
    return asof_join(
        purchases, clicks, on="ts", by="user_id", num_buckets=8,
        # typed-empty stand-ins for a 0-row events table (schema-less
        # sides would otherwise KeyError inside merge_asof on "ts")
        left_empty={"event_id": "int64", "ts": "datetime64[us]",
                    "user_id": "int64"},
        right_empty={"user_id": "int64", "ts": "datetime64[us]",
                     "click_ts": "datetime64[us]"})


def value_median(sf_dir: str):
    """Exact per-type median of event values (+ count): tiny key
    cardinality → one bucketed exchange, whole-group pandas median
    (identical even-count interpolation to DuckDB's ``median``)."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).agg(
            median_value=("value", "median"), n=("value", "size"))
        g["n"] = g["n"].astype("int64")
        return g

    ds = read_table(sf_dir, "events", ["event_type", "value"])
    return grouped_map(ds, ["event_type"], bucket, num_buckets=4)


def value_hist(sf_dir: str, width: float = 50.0):
    """Fixed-width value histogram: per-batch vectorized binning +
    combiner, then a tiny grouped sum (the at-scale histogram shape:
    the exchange carries one row per (batch, bin))."""
    import numpy as np
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        bins = np.floor(b["value"].to_numpy() / width).astype(np.int64)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(uniq, pa.int64()),
                         "n_partial": pa.array(counts, pa.int64())})

    ds = read_table(sf_dir, "events", ["value"])
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, ["bin"], {"n": ("n_partial", "sum")},
                       num_buckets=4)


def distinct_kmv(sf_dir: str, k: int = 64):
    """Approximate distinct (user, day) pairs per event_type via the
    mergeable KMV sketch (``baram_ray/sketches.py``): deterministic
    fixed-hash sketch → the ESTIMATE itself is hash-exact against the
    DuckDB oracle that ranks the same hashes. Partials carry at most k
    rows per (batch, type) — the at-scale sketch shape."""
    import numpy as np

    from baram_ray.sketches import distinct_kmv as _kmv

    ds = read_table(sf_dir, "events", ["event_type", "user_id", "ts"])

    def key_fn(b) -> np.ndarray:
        days = b["ts"].to_numpy().astype("datetime64[s]") \
                      .astype(np.int64) // 86400
        return b["user_id"].to_numpy(zero_copy_only=False) * 100000 + days

    return _kmv(ds, key_fn, "event_type", k=k)


def hopping_counts(sf_dir: str, window_hours: int = 2,
                   hop_hours: int = 1):
    """Hopping-window event counts (2-hour windows, 1-hour hop): each
    event contributes to window_hours/hop_hours windows — a per-batch
    vectorized flat-map + combiner, then one tiny grouped sum. The
    overlapping-window aggregate the alert conditions' tumbling windows
    don't cover. SQL-expressible (unnest of the window starts)."""
    import numpy as np
    import pyarrow as pa

    n_windows = window_hours // hop_hours

    def partial(b: pa.Table) -> pa.Table:
        hours = b["ts"].to_numpy().astype("datetime64[h]")
        ws = np.concatenate([hours - np.timedelta64(i * hop_hours, "h")
                             for i in range(n_windows)])
        uniq, counts = np.unique(ws, return_counts=True)
        return pa.table({"ws": pa.array(uniq.astype("datetime64[us]")),
                         "n_partial": pa.array(counts, pa.int64())})

    ds = read_table(sf_dir, "events", ["ts"])
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, ["ws"], {"n": ("n_partial", "sum")},
                       num_buckets=4)


def user_topk(sf_dir: str, k: int = 10):
    """G8-style top-k by activity (ties: user_id asc)."""
    ds = read_table(sf_dir, "events", ["user_id"])
    return (grouped_agg(ds, ["user_id"], {"n": (None, "count")},
                        num_buckets=16)
            .sort(["n", "user_id"], descending=[True, False]).limit(k))


def range_count_clicks(sf_dir: str, window_minutes: int = 60):
    """Windowed range join: for every purchase, the number of clicks by
    the same user in the ``window_minutes`` before it, bounds
    (purchase_ts - window, purchase_ts] — the band/range-join shape the
    Dataset API lacks natively. Co-partition both sides by user through
    ONE cogroup exchange; inside each bucket the count per purchase is a
    vectorized two-``searchsorted`` difference over that user's sorted
    click timestamps (no per-row loop, no cross product). At scale the
    partition key is the user — a hot user concentrates in one task, the
    standard salting caveat. Hash-exact vs a DuckDB range-predicate
    join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from baram_ray.util import cogroup

    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id",
                                       "event_type"])
    purchases = ds.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase"))
                   .drop_columns(["event_type"]),
        batch_format="pyarrow")
    clicks = ds.map_batches(
        lambda b: pa.table({
            "user_id": b.filter(pc.equal(b["event_type"], "click"))["user_id"],
            "click_ts": b.filter(pc.equal(b["event_type"], "click"))["ts"]}),
        batch_format="pyarrow")

    win = np.timedelta64(window_minutes, "m")

    def count_in_window(p_df: pd.DataFrame, c_df: pd.DataFrame
                        ) -> pd.DataFrame:
        out = []
        c_df = c_df.sort_values(["user_id", "click_ts"], kind="stable")
        for uid, g in p_df.groupby("user_id", sort=False):
            cts = c_df.loc[c_df["user_id"] == uid, "click_ts"] \
                      .to_numpy("datetime64[us]")
            pts = g["ts"].to_numpy("datetime64[us]")
            # (ts - win, ts]: left-exclusive, right-inclusive
            hi = np.searchsorted(cts, pts, side="right")
            lo = np.searchsorted(cts, pts - win, side="right")
            out.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(),
                "ts": pts,
                "user_id": np.full(len(g), uid, dtype=np.int64),
                "n_clicks_1h": (hi - lo).astype("int64"),
            }))
        if not out:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "ts": pd.Series(dtype="datetime64[us]"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "n_clicks_1h": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return cogroup(
        purchases, clicks, ["user_id"], count_in_window, num_buckets=8,
        left_empty={"event_id": "int64", "ts": "datetime64[us]",
                    "user_id": "int64"},
        right_empty={"user_id": "int64",
                     "click_ts": "datetime64[us]"})


def comments_stats(sf_dir: str):
    """S8 comment JSONP reader end-to-end (``baram_ray/comments.py``):
    synthesize one JSONP comment page per (article, block) from the
    events table with a fixed deterministic field mapping, parse the
    payloads back through the reference's parse chain (callback-regex →
    JSON → visibility filter → content cleaning), then per-article
    stats through the bucketed exchange. The SQL oracle computes the
    same aggregate DIRECTLY from events — hash equality proves
    parse(jsonp(x)) == x including tag-strip + entity-decode."""
    import json as _json

    import pyarrow as pa

    from baram_ray.comments import article_comment_stats, parse_comment_pages

    ds = read_table(sf_dir, "events",
                    ["event_id", "ts", "user_id", "event_type"])

    def synth_pages(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        uid = batch["user_id"].to_numpy()
        ts_ms = batch["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        etype = batch["event_type"].to_pylist()
        pages: dict[int, list] = {}
        for i in range(len(eid)):
            e = int(eid[i])
            pages.setdefault(e % 50, []).append({
                "comment_no": e,
                "parent_comment_no": e - 50 if (e % 5 == 0 and e >= 50)
                else 0,
                "contents": f"<b>{etype[i]}</b> &amp; ok",
                "user_name": f"u{int(uid[i])}",
                "masked_user_id": f"m{int(uid[i])}",
                "reg_time": int(ts_ms[i]),
                "mod_time": 0,
                "sympathy_count": int(uid[i]) % 100,
                "antipathy_count": int(uid[i]) % 7,
                "reply_count": 0,
                "best": e % 10 == 0,
                "visible": e % 11 != 0,
                "deleted": e % 13 == 0,
            })
        aids, payloads = [], []
        for aid, lst in pages.items():
            body = _json.dumps({"success": True,
                                "result": {"commentList": lst}})
            aids.append(aid)
            payloads.append(f"_callback({body});")
        return pa.table({"article_id": pa.array(aids, pa.int64()),
                         "payload": pa.array(payloads, pa.string())})

    flat = parse_comment_pages(
        ds.map_batches(synth_pages, batch_format="pyarrow"))
    return article_comment_stats(flat)


def value_quantiles(sf_dir: str):
    """Exact per-type discrete quantiles (p50/p95/p99) of event values:
    one bucketed exchange on the (tiny-cardinality) type key, per-group
    sort + index pick using DuckDB's ``quantile_disc`` convention
    (element at ceil(q·n)−1 of the sorted values) so the oracle is
    hash-exact. At scale the same exchange applies — a group's values
    co-locate in its bucket; for corpus-sized groups swap in the KMV/
    t-digest sketch path."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(np.float64))
            n = len(v)
            pick = lambda q: float(v[min(n - 1, int(np.ceil(q * n)) - 1)])
            rows.append({"event_type": et, "n": np.int64(n),
                         "p50": pick(0.5), "p95": pick(0.95),
                         "p99": pick(0.99)})
        out = pd.DataFrame(rows)
        if len(out):
            out["n"] = out["n"].astype("int64")
        return out

    ds = read_table(sf_dir, "events", ["event_type", "value"])
    return grouped_map(ds, ["event_type"], bucket, num_buckets=4)


def funnel(sf_dir: str,
           stages: tuple[str, ...] = ("view", "click", "purchase")):
    """Ordered first-occurrence funnel (the standard product-analytics
    op): a user reaches stage i+1 at the EARLIEST stage-i+1 event
    STRICTLY AFTER their stage-i time (t1 = min view, t2 = min click
    > t1, ...). Returns one row per stage with the user count.

    Scale shape: only the stage-typed events leave the scan; ONE hash
    exchange on user_id co-locates each user's history; per-bucket
    stage times fall out of a per-user sorted walk and collapse
    immediately to a 1-row partial per bucket — the driver sees
    len(stages) integers per bucket. SQL-expressible (chained
    min-after joins) → hash-exact oracle."""
    ds = read_table(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(stages)]

    ev = ds.map_batches(prefilter, batch_format="pandas")

    def bucket_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(stages), dtype=np.int64)
        b = bucket.sort_values(["user_id", "ts"], kind="stable")
        for _, g in b.groupby("user_id", sort=False):
            types = g["event_type"].to_numpy()
            ts = g["ts"].to_numpy()
            prev_t = None
            for i, st in enumerate(stages):
                m = (types == st) if prev_t is None \
                    else (types == st) & (ts > prev_t)
                if not m.any():
                    break
                prev_t = ts[m].min()
                counts[i] += 1
        return pd.DataFrame({"stage": list(stages),
                             "stage_idx": np.arange(len(stages),
                                                    dtype=np.int64),
                             "users": counts})

    parts = grouped_map(ev, ["user_id"], bucket_counts, num_buckets=8)
    out = grouped_agg(parts, ["stage", "stage_idx"],
                      {"users": ("users", "sum")},
                      num_buckets=1).to_pandas()
    if "stage" not in out.columns:
        # 0-row events table: the oracle's chained min-after joins
        # still emit one row PER STAGE with users=0 — match that, not
        # a schema-less empty
        return pd.DataFrame({"stage": list(stages),
                             "stage_idx": np.arange(len(stages),
                                                    dtype=np.int64),
                             "users": np.zeros(len(stages),
                                               dtype=np.int64)})
    out["users"] = out["users"].astype("int64")
    return out[["stage", "stage_idx", "users"]]


def retention(sf_dir: str):
    """Weekly cohort retention (the standard growth-analytics matrix):
    a user's cohort is the ISO week-start of their FIRST event; for
    each (cohort_week, week_offset) the count of cohort users active
    that week. ONE exchange on user_id — per bucket, each user's
    (cohort, offset) pairs are distinct by construction, so the bucket
    emits count partials directly; a tiny second exchange sums them.
    Weeks are epoch-aligned 7-day buckets (floor(epoch_days / 7)), the
    same arithmetic DuckDB runs → hash-exact."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def bucket_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        days = bucket["ts"].to_numpy("datetime64[D]").astype(np.int64)
        weeks = days // 7
        df = pd.DataFrame({"user_id": bucket["user_id"].to_numpy(),
                           "week": weeks})
        first = df.groupby("user_id", sort=False)["week"].transform("min")
        pairs = pd.DataFrame({
            "cohort_week": first,
            "week_offset": df["week"] - first,
            "user_id": df["user_id"],
        }).drop_duplicates()
        out = pairs.groupby(["cohort_week", "week_offset"],
                            as_index=False).size() \
                   .rename(columns={"size": "users"})
        return out

    parts = grouped_map(ds, ["user_id"], bucket_counts, num_buckets=8)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_week": df["cohort_week"].astype("int64"),
            "week_offset": df["week_offset"].astype("int64"),
            "users": df["users"].astype("int64"),
        })

    return grouped_agg(parts, ["cohort_week", "week_offset"],
                       {"users": ("users", "sum")}, num_buckets=2,
                       finalize=cast)


def value_stats(sf_dir: str):
    """Per-type moments via MERGEABLE partials (the combiner shape a
    100-TB aggregate needs): each batch emits (n, Σx, Σx²) per type
    over MILLI-QUANTIZED values (x = trunc(v·1000 + 0.5) — exact
    integers, so the sums are order-independent), the tiny groupby
    sums them, and mean / var_pop derive from the exact sums with the
    SAME operation order as the SQL — bit-exact with NO rounding.
    (The earlier float-Σv version rounded to 6, which differential
    fuzzing caught straddling a rounding boundary when the two
    engines' summation orders differed by one ulp.)"""
    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.trunc(df["value"].to_numpy(np.float64) * 1000.0
                     + 0.5).astype(np.int64)
        g = df.assign(x=x, x2=x * x).groupby("event_type",
                                             as_index=False) \
              .agg(n=("x", "size"), s=("x", "sum"), s2=("x2", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    tot = grouped_agg(parts, ["event_type"],
                      {"n": ("n", "sum"), "s": ("s", "sum"),
                       "s2": ("s2", "sum")}, num_buckets=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        s = df["s"].to_numpy(np.float64)
        s2 = df["s2"].to_numpy(np.float64)
        mean_x = s / n
        return pd.DataFrame({
            "event_type": df["event_type"],
            "n": df["n"].astype("int64"),
            "mean": mean_x / 1000.0,
            "var_pop": (s2 / n - mean_x * mean_x) / 1000000.0,
        })

    return tot.map_batches(finish, batch_format="pandas")


def value_quantiles_sketch(sf_dir: str, k: int | None = None):
    """Per-type quantiles via the MERGEABLE KLL sketch
    (``sketches.kll_*``) — the bounded-memory path for corpus-sized
    groups (the exact op sorts a whole group in one task): each batch
    emits ≤ k sketch rows (event_type, level, value) per type, the
    type-keyed reduce merges + compacts once and reads the quantiles.
    Total weight is conserved exactly, so ``n`` is exact at any scale.
    ``k`` defaults to the TABLE row count (parquet metadata, no data
    read) so per-type counts stay under k → no compaction → the
    quantiles equal the exact op's and the quantile_disc oracle stays
    hash-exact at every sf (this query demonstrates the sketch in its
    exact regime; a production pipeline pins k and rides the
    hypothesis-tested deep-compaction error envelope instead — the
    sf1 sweep caught the fixed k=32768 leaving the exact regime at
    1M rows)."""
    from baram_ray.sketches import (
        kll_merge, kll_partial, kll_quantile, kll_total_weight,
    )

    if k is None:
        import pyarrow.parquet as _pq
        n_rows = _pq.ParquetFile(
            f"{sf_dir}/events.parquet").metadata.num_rows
        k = max(32768, int(n_rows) + 1)

    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ets, lvls, vals = [], [], []
        for et, g in df.groupby("event_type", sort=False):
            sk = kll_partial(g["value"].to_numpy(np.float64), k)
            for lvl, arr in sk.items():
                ets.extend([et] * len(arr))
                lvls.extend([lvl] * len(arr))
                vals.extend(arr.tolist())
        return pd.DataFrame({"event_type": ets,
                             "level": np.asarray(lvls, np.int64),
                             "value": np.asarray(vals, np.float64)})

    parts = ds.map_batches(partial, batch_format="pandas")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            levels = {int(lvl): gg["value"].to_numpy(np.float64)
                      for lvl, gg in g.groupby("level", sort=False)}
            sk = kll_merge([levels], k)
            rows.append({"event_type": et,
                         "n": np.int64(kll_total_weight(sk)),
                         "p50": kll_quantile(sk, 0.5),
                         "p95": kll_quantile(sk, 0.95),
                         "p99": kll_quantile(sk, 0.99)})
        out = pd.DataFrame(rows)
        if len(out):
            out["n"] = out["n"].astype("int64")
        return out

    return grouped_map(parts, ["event_type"], reduce, num_buckets=4)


def user_lifetime(sf_dir: str):
    """Per-user lifetime summary (first/last event, span, event count)
    — one bucketed exchange on user_id with per-batch combiner
    partials (min/max/count merge associatively). Hash-exact oracle."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(
            first_ts=("ts", "min"), last_ts=("ts", "max"),
            n_events=("ts", "size"))
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    tot = grouped_agg(parts, ["user_id"],
                      {"first_ts": ("first_ts", "min"),
                       "last_ts": ("last_ts", "max"),
                       "n_events": ("n_events", "sum")}, num_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        span = (df["last_ts"].to_numpy("datetime64[us]").astype(np.int64)
                - df["first_ts"].to_numpy("datetime64[us]")
                    .astype(np.int64)) // 1_000_000
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "first_ts": df["first_ts"],
            "last_ts": df["last_ts"],
            "lifetime_sec": span.astype("int64"),
            "n_events": df["n_events"].astype("int64"),
        })

    return tot.map_batches(finish, batch_format="pandas")


def activity_heatmap(sf_dir: str):
    """Day-of-week × hour event-count heatmap (ISO dow, Mon=1): the
    classic ops dashboard matrix — per-batch (dow, hour) partial
    counts, tiny groupby. Hash-exact (isodow/hour arithmetic matches
    numpy's weekday+1 / hour extraction)."""
    ds = read_table(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"])
        g = pd.DataFrame({
            "dow": (t.dt.dayofweek + 1).astype("int64"),   # ISO Mon=1
            "hour": t.dt.hour.astype("int64"),
        }).groupby(["dow", "hour"], as_index=False).size() \
          .rename(columns={"size": "n"})
        return g

    parts = ds.map_batches(partial, batch_format="pandas")

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df

    return grouped_agg(parts, ["dow", "hour"], {"n": ("n", "sum")},
                       num_buckets=2, finalize=cast)


def transitions(sf_dir: str):
    """Per-user event-type transition counts (the Markov/behavior
    matrix): consecutive event pairs in each user's ts-ordered history
    (ties broken by event_id — deterministic on both sides), counted
    per (prev_type, next_type). ONE user-keyed exchange; per-bucket
    partial counts. Hash-exact lag-window oracle."""
    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_type",
                                       "event_id"])

    def bucket_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="stable")
        same_user = b["user_id"].to_numpy()[1:] \
            == b["user_id"].to_numpy()[:-1]
        prev_t = b["event_type"].to_numpy()[:-1][same_user]
        next_t = b["event_type"].to_numpy()[1:][same_user]
        g = pd.DataFrame({"prev_type": prev_t, "next_type": next_t}) \
            .groupby(["prev_type", "next_type"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return g

    parts = grouped_map(ds, ["user_id"], bucket_counts, num_buckets=8)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df

    return grouped_agg(parts, ["prev_type", "next_type"],
                       {"n": ("n", "sum")}, num_buckets=2,
                       finalize=cast)


def dau_wau(sf_dir: str):
    """Weekly engagement: distinct weekly actives (WAU), the mean of
    the 7 daily-active counts (avg DAU), and stickiness = avg_dau/wau
    — the standard growth metric pair. ONE user-keyed exchange emits
    each user's distinct (week, day) activity pairs (bucket-local
    dedup), then tiny per-week aggregates; weeks/days are epoch-aligned
    integer buckets exactly as the retention op computes them."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        days = bucket["ts"].to_numpy("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"user_id": bucket["user_id"].to_numpy(),
                           "day": days, "week": days // 7}) \
               .drop_duplicates()
        return df

    pairs = grouped_map(ds, ["user_id"], per_user, num_buckets=8)

    def week_stats(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for wk, g in bucket.groupby("week", sort=False):
            wau = g["user_id"].nunique()
            dau = g.groupby("day")["user_id"].nunique()
            avg_dau = float(dau.sum()) / 7.0
            rows.append({"week": np.int64(wk), "wau": np.int64(wau),
                         "avg_dau": round(avg_dau, 6),
                         "stickiness": round(avg_dau / wau, 6)})
        out = pd.DataFrame(rows)
        if len(out):
            out["week"] = out["week"].astype("int64")
            out["wau"] = out["wau"].astype("int64")
        return out

    return grouped_map(pairs, ["week"], week_stats, num_buckets=2)


def value_outliers_mad(sf_dir: str):
    """Robust per-type outlier counts via Median Absolute Deviation
    (the z-score's robust sibling — G5's spike detector breaks on
    heavy tails): med = quantile_disc-0.5 of values, MAD =
    quantile_disc-0.5 of |v − med|, outlier ⇔ |v − med| > 3·MAD.
    Discrete quantiles make both sides bit-deterministic (no rounding
    anywhere). One type-keyed exchange; per-group vectorized."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(np.float64))
            n = len(v)
            med = float(v[min(n - 1, int(np.ceil(0.5 * n)) - 1)])
            dev = np.sort(np.abs(g["value"].to_numpy(np.float64) - med))
            mad = float(dev[min(n - 1, int(np.ceil(0.5 * n)) - 1)])
            out = int((np.abs(g["value"].to_numpy(np.float64) - med)
                       > 3.0 * mad).sum())
            rows.append({"event_type": et, "n": np.int64(n),
                         "med": med, "mad": mad,
                         "n_outliers": np.int64(out)})
        o = pd.DataFrame(rows)
        if len(o):
            o["n"] = o["n"].astype("int64")
            o["n_outliers"] = o["n_outliers"].astype("int64")
        return o

    ds = read_table(sf_dir, "events", ["event_type", "value"])
    return grouped_map(ds, ["event_type"], bucket, num_buckets=4)


def holt_linear(series: np.ndarray, alpha: float, beta: float,
                horizon: int) -> np.ndarray:
    """Holt's linear-trend recursion (level/trend double smoothing,
    init level=y₀ trend=y₁−y₀) → the ``horizon`` h-step forecasts
    level + h·trend. Pure function so the driver's only ``no_oracle``
    query carries hypothesis property coverage (exactness on affine
    series, shift/scale equivariance) besides the bit-exact
    recomputation test."""
    series = np.asarray(series, dtype=np.float64)
    level, trend = series[0], series[1] - series[0]
    for y in series[1:]:
        prev = level
        level = alpha * y + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1.0 - beta) * trend
    h = np.arange(1, horizon + 1, dtype=np.float64)
    return level + h * trend


def forecast_holt(sf_dir: str, alpha: float = 0.5, beta: float = 0.3,
                  horizon: int = 7):
    """Holt's linear-trend forecast (double exponential smoothing) of
    per-type daily event counts — the G6 trend-velocity surface
    extended to prediction. Each type's series (zero-filled over its
    own [first, last] day range) smooths sequentially inside its
    exchange bucket; output is the ``horizon`` daily forecasts per
    type. The recursion unrolls exactly in SQL via a RECURSIVE CTE
    (same op order, constants folded identically) → hash-exact DuckDB
    oracle; pytest additionally recomputes the recursion
    independently."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            days = g["ts"].to_numpy("datetime64[D]").astype(np.int64)
            lo, hi = int(days.min()), int(days.max())
            series = np.zeros(hi - lo + 1, dtype=np.float64)
            np.add.at(series, days - lo, 1.0)
            if len(series) < 2:
                continue
            fc = holt_linear(series, alpha, beta, horizon)
            for h in range(1, horizon + 1):
                rows.append({"event_type": et,
                             "day": np.int64(hi + h),
                             "forecast": round(float(fc[h - 1]), 6)})
        out = pd.DataFrame(rows)
        if len(out):
            out["day"] = out["day"].astype("int64")
        return out

    ds = read_table(sf_dir, "events", ["event_type", "ts"])
    return grouped_map(ds, ["event_type"], bucket, num_buckets=4)


def user_gini(sf_dir: str):
    """Gini coefficient of per-user event counts (activity
    concentration — the whale-vs-long-tail diagnostic): sorted-rank
    closed form G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n over counts sorted by
    (count, user_id). Per-user counts via the exchange; the
    coefficient consumes the user-cardinality table. The identical
    expression runs in the oracle (round-6 absorbs sum order)."""
    from baram_ray.util import grouped_agg

    ds = read_table(sf_dir, "events", ["user_id"])
    counts = grouped_agg(ds, ["user_id"], {"n": (None, "count")},
                         num_buckets=8).to_pandas()
    if "n" not in counts.columns or not len(counts):
        # 0-row events table: SQL aggregate over zero users yields one
        # row (n_users=0, gini=NULL) — the closed form below would 0/0
        return pd.DataFrame({
            "n_users": pd.array([0], dtype="int64"),
            "gini": pd.array([np.nan], dtype="float64")})
    counts = counts.sort_values(["n", "user_id"], kind="stable")
    x = counts["n"].to_numpy(np.float64)
    n = float(len(x))
    i = np.arange(1, len(x) + 1, dtype=np.float64)
    g = (2.0 * float((i * x).sum())) / (n * float(x.sum())) \
        - (n + 1.0) / n
    return pd.DataFrame({
        "n_users": pd.array([int(n)], dtype="int64"),
        "gini": pd.array([round(g, 6)], dtype="float64"),
    })


def session_stats(sf_dir: str, gap_minutes: int = 30):
    """Per-user session summary on top of ``sessionize`` (composition —
    the session table is already user-partitioned, so the second
    aggregate reuses the same key): sessions per user, total events,
    mean session length in whole seconds (exact integer-microsecond
    arithmetic; mean = exact sum / count, round-6)."""
    sess = sessionize(sf_dir, gap_minutes=gap_minutes)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        dur_us = (df["session_end"].to_numpy("datetime64[us]")
                  .astype(np.int64)
                  - df["session_start"].to_numpy("datetime64[us]")
                  .astype(np.int64))
        d = df.assign(dur_s=dur_us // 1_000_000)
        g = d.groupby("user_id", as_index=False).agg(
            n_sessions=("dur_s", "size"),
            total_events=("n_events", "sum"),
            total_dur_s=("dur_s", "sum"))
        out = pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "n_sessions": g["n_sessions"].astype("int64"),
            "total_events": g["total_events"].astype("int64"),
            "mean_session_s": (g["total_dur_s"].to_numpy(np.float64)
                               / g["n_sessions"].to_numpy(np.float64))
                              .round(6),
        })
        return out

    from baram_ray.util import grouped_map as _gm
    return _gm(sess, ["user_id"], per_user, num_buckets=8)


def topn_per_user(sf_dir: str, n: int = 3):
    """Top-N-per-group — the windowed row_number() shape (distinct from
    a global top-k: every group keeps its own N): each user's ``n``
    highest-value events, rank ties broken by event_id asc. One
    user-keyed exchange; inside each bucket a single vectorized
    sort + cumcount gives ranks for every user at once. Hash-exact vs
    the SQL window oracle."""
    from baram_ray.util import grouped_map

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "value", "event_id"],
                           ascending=[True, False, True], kind="stable")
        d["rnk"] = d.groupby("user_id", sort=False).cumcount() + 1
        d = d[d["rnk"] <= n]
        return pd.DataFrame({
            "user_id": d["user_id"].to_numpy(np.int64),
            "rnk": d["rnk"].to_numpy(np.int64),
            "event_id": d["event_id"].to_numpy(np.int64),
            "value": d["value"].to_numpy(np.float64),
        })

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "value"])
    return grouped_map(ds, ["user_id"], bucket, num_buckets=8)


def inter_event_deltas(sf_dir: str):
    """Per-user inter-event gaps — the lag() window shape: for every
    event after a user's first, the seconds since that user's previous
    event (order by ts, event_id). One user-keyed exchange; inside a
    bucket ONE vectorized sort + shift computes every user's lags
    (NULL-dropping matches the SQL's lag IS NOT NULL). Hash-exact
    oracle."""
    from baram_ray.util import grouped_map

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"],
                           kind="stable").reset_index(drop=True)
        same = d["user_id"].eq(d["user_id"].shift())
        prev = d["ts"].shift()
        gap = (d["ts"] - prev).dt.total_seconds()
        m = same.to_numpy()
        return pd.DataFrame({
            "user_id": d["user_id"].to_numpy(np.int64)[m],
            "event_id": d["event_id"].to_numpy(np.int64)[m],
            "gap_sec": np.round(gap.to_numpy(np.float64)[m], 6),
        })

    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id"])
    return grouped_map(ds, ["user_id"], bucket, num_buckets=8)


def running_daily_total(sf_dir: str):
    """Cumulative daily count per event_type — the unbounded-preceding
    window sum: the tiny (type, day) aggregate comes from the exchange,
    the running total is a per-type cumsum over the day-sorted series
    (bounded by days, not events). Hash-exact oracle."""

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        g["running_n"] = g["n"].cumsum().astype("int64")
        return g

    return _daily(sf_dir).groupby("event_type").map_groups(
        roll, batch_format="pandas")


def daily_click_purchase(sf_dir: str):
    """FULL OUTER join of two day-keyed aggregates (daily click counts
    ⟗ daily purchase counts): days with only one side survive with a
    zero for the other. Each side is a per-batch-combined day exchange
    (bounded by days); the join is ONE cogroup exchange via
    ``hash_join(how="outer")`` — §2.4's remaining join type. Hash-exact
    oracle (COALESCE(0) on both sides keeps dtypes integral)."""
    from baram_ray.joins import hash_join

    ds = read_table(sf_dir, "events", ["event_type", "ts"])

    def side(typ: str, out_col: str):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            sel = df.loc[df["event_type"] == typ]
            g = pd.DataFrame({"day": sel["ts"].dt.floor("D")}) \
                .groupby("day", as_index=False).size() \
                .rename(columns={"size": out_col})
            g[out_col] = g[out_col].astype("int64")
            return g

        return grouped_agg(ds.map_batches(part, batch_format="pandas"),
                           ["day"], {out_col: (out_col, "sum")},
                           num_buckets=4)

    j = hash_join(side("click", "n_clicks"),
                  side("purchase", "n_purchases"),
                  on="day", how="outer", num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": df["day"].astype("datetime64[us]"),
            "n_clicks": df["n_clicks"].fillna(0).astype("int64"),
            "n_purchases": df["n_purchases"].fillna(0).astype("int64"),
        })

    from baram_ray.pipelines.util import ensure_cols
    out = ensure_cols(j.map_batches(finish, batch_format="pandas"),
                      {"day": "datetime64[us]", "n_clicks": "int64",
                       "n_purchases": "int64"})
    return out.sort_values("day", kind="stable").reset_index(drop=True)


def user_freq_cms(sf_dir: str, topn: int = 20):
    """CountMin frequency estimation over user event counts — the
    deterministic multiply-shift sketch is a pure function of the
    input multiset, so the ESTIMATES are hash-exact against a DuckDB
    oracle that rebuilds the identical d×w counter table in HUGEINT
    arithmetic. One streaming pass emits (row, bucket) counter cells
    (≤ d·w per batch) AND exact per-user counts through the same
    exchange; the driver reduces a d·w matrix + user-bounded rows.
    Output: top-``topn`` users by estimated count (est ≥ true always;
    equality when the user's buckets are collision-free)."""
    from baram_ray.sketches import CMS_W, cms_estimate, cms_partial

    ds = read_table(sf_dir, "events", ["user_id"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        cms = cms_partial(uid)
        i, b = np.nonzero(cms)
        cells = pd.DataFrame({"row": i.astype(np.int64),
                              "col": b.astype(np.int64),
                              "cnt": cms[i, b]})
        g = pd.DataFrame({"col": uid}).groupby("col", as_index=False) \
            .size().rename(columns={"size": "cnt"})
        g.insert(0, "row", np.int64(-1))
        g["cnt"] = g["cnt"].astype("int64")
        return pd.concat([cells, g], ignore_index=True)

    agg = grouped_agg(ds.map_batches(part, batch_format="pandas"),
                      ["row", "col"], {"cnt": ("cnt", "sum")},
                      num_buckets=4).to_pandas()   # ≤ d·w + |users|
    if "row" not in agg.columns:        # schema-less when input empty
        agg = pd.DataFrame({"row": pd.Series(dtype="int64"),
                            "col": pd.Series(dtype="int64"),
                            "cnt": pd.Series(dtype="int64")})
    users = agg[agg["row"] == -1]
    cms = np.zeros((4, CMS_W), dtype=np.int64)
    cells = agg[agg["row"] >= 0]
    cms[cells["row"].to_numpy(np.int64),
        cells["col"].to_numpy(np.int64)] = cells["cnt"].to_numpy(np.int64)
    uid = users["col"].to_numpy(np.int64)
    out = pd.DataFrame({
        "user_id": uid,
        "est_count": cms_estimate(cms, uid),
        "true_count": users["cnt"].to_numpy(np.int64),
    }).sort_values(["est_count", "user_id"], ascending=[False, True],
                   kind="stable").head(topn).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def value_hour_corr(sf_dir: str):
    """Pearson correlation of event value (exact cents) vs hour-of-day
    per event_type — the COVAR/CORR aggregate from constant-size
    streaming partials (n, Σx, Σy, Σxy, Σx², Σy² as exact integers per
    batch; the exchange moves one row per (block, type)). The final r
    is computed from the exact sums with the SAME operation order as
    the SQL oracle (num / (sqrt(a)·sqrt(b))), so it is bit-identical
    with no rounding. Python-int partial sums on the driver side of
    the finish keep the formula exact where int64 would overflow at
    extreme scale (the SQL side uses HUGEINT for the same reason)."""
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        x = np.trunc(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        y = df["ts"].dt.hour.to_numpy().astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"], "x": x, "y": y,
                          "xy": x * y, "xx": x * x, "yy": y * y})
        out = g.groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"))
        out["n"] = out["n"].astype("int64")
        return out

    agg = grouped_agg(ds.map_batches(part, batch_format="pandas"),
                      ["event_type"],
                      {"n": ("n", "sum"), "sx": ("sx", "sum"),
                       "sy": ("sy", "sum"), "sxy": ("sxy", "sum"),
                       "sxx": ("sxx", "sum"), "syy": ("syy", "sum")},
                      num_buckets=2).to_pandas()   # ≤ |event types|

    import math

    rows = []
    for r in agg.itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        num = n * int(r.sxy) - sx * sy              # exact python ints
        a = n * int(r.sxx) - sx * sx
        b = n * int(r.syy) - sy * sy
        corr = (float(num) / (math.sqrt(float(a)) * math.sqrt(float(b)))
                if a > 0 and b > 0 else 0.0)
        rows.append({"event_type": r.event_type, "n": n,
                     "corr_r": corr})
    out = pd.DataFrame(rows, columns=["event_type", "n", "corr_r"])
    out["n"] = out["n"].astype("int64")
    out["corr_r"] = out["corr_r"].astype("float64")
    return out.sort_values("event_type", kind="stable") \
              .reset_index(drop=True)


def running_value(sf_dir: str, num_buckets: int = 8):
    """Global running total of event value (exact cents) in event_id
    order — the DISTRIBUTED PREFIX SCAN: contiguous event_id ranges
    form the buckets (range partitioning, not hash — a prefix needs
    ordered buckets), phase 1 aggregates one partial sum per bucket
    (driver holds B integers), phase 2 re-runs the buckets adding the
    exclusive prefix of the earlier buckets' sums to an in-bucket
    cumsum. Two exchanges total, O(buckets) driver state, output is
    row-per-event. Hash-exact against the SQL window oracle
    (sum OVER ORDER BY event_id) because every partial is an exact
    integer."""
    import pyarrow.parquet as _pq

    from baram_ray.pipelines.util import ensure_cols

    path = f"{sf_dir}/events.parquet"
    pf = _pq.ParquetFile(path)
    stats = [pf.metadata.row_group(i).column(0).statistics
             for i in range(pf.metadata.num_row_groups)]
    stats = [s for s in stats if s is not None and s.min is not None]
    if not stats:                       # 0-row table: stats are absent
        lo, hi = 0, 0
    else:
        lo = min(s.min for s in stats)
        hi = max(s.max for s in stats)
    span = max(int(hi) - int(lo) + 1, 1)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": ((eid - lo) * num_buckets // span).clip(
                0, num_buckets - 1),
            "event_id": eid,
            "c": np.trunc(df["value"].to_numpy() * 100.0
                          + 0.5).astype(np.int64)})

    ds = read_table(sf_dir, "events", ["event_id", "value"]) \
        .map_batches(with_bucket, batch_format="pandas")

    # phase 1: one exact partial per bucket → exclusive prefix
    parts = grouped_agg(ds, ["bucket"], {"s": ("c", "sum")},
                        num_buckets=2).to_pandas()
    prefix = np.zeros(num_buckets, dtype=np.int64)
    for r in parts.itertuples():
        prefix[int(r.bucket) + 1:] += int(r.s)

    # phase 2: in-bucket ordered cumsum + the bucket's prefix base
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, g in df.groupby("bucket"):
            g = g.sort_values("event_id", kind="stable")
            out.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(np.int64),
                "cum_value_c": g["c"].cumsum().to_numpy(np.int64)
                               + prefix[int(b)]}))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "cum_value_c": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    res = grouped_map(ds, ["bucket"], scan, num_buckets=num_buckets)
    return ensure_cols(res, {"event_id": "int64",
                             "cum_value_c": "int64"})


def value_ntile(sf_dir: str, tiles: int = 4, num_buckets: int = 8):
    """Global NTILE(``tiles``) of events by (value cents, event_id) —
    DISTRIBUTED RANKING: value-range buckets from deterministic
    hash-sampled quantile splits (ties stay within one bucket because
    splits are drawn from the value domain itself and assignment is
    side='right'; correctness is split-independent — only balance
    depends on them), phase 1 counts rows per bucket (driver holds B
    integers → exact global offsets), phase 2 ranks locally and
    applies SQL's exact NTILE rule (first n%tiles buckets get one
    extra row). Row-per-event output, hash-exact against the window
    oracle."""
    from baram_ray.pipelines.util import ensure_cols
    from baram_ray.sampling import knuth_hash32

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "c": np.trunc(df["value"].to_numpy() * 100.0
                          + 0.5).astype(np.int64)})

    ds = read_table(sf_dir, "events", ["event_id", "value"]) \
        .map_batches(cents, batch_format="pandas")

    # split points = quantiles of a deterministic key-hash sample with
    # a FIXED expected size (rate = target/n from parquet metadata, so
    # the driver-side sample stays ~4k rows at any corpus size;
    # reshard-stable; a skewed distribution gets balanced buckets
    # where equal-width splits would collapse)
    n_rows = read_table(sf_dir, "events", ["event_id"]).count()
    rate = min(1.0, 4096.0 / max(n_rows, 1))
    cut = np.uint64(int(rate * 4294967296.0))

    def pick_sample(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash32(df["event_id"].to_numpy(np.int64))
        return df.loc[h < cut, ["c"]]

    samp = ds.map_batches(pick_sample, batch_format="pandas").to_pandas()
    # 0-row table → schema-less to_pandas() drops columns entirely
    sample = (np.sort(samp["c"].to_numpy(np.int64))
              if "c" in samp.columns else np.zeros(0, dtype=np.int64))
    if len(sample):
        qs = np.linspace(0, len(sample) - 1, num_buckets + 1)[1:-1]
        splits = sample[qs.astype(np.int64)].astype(np.float64)
    else:
        splits = np.zeros(0, dtype=np.float64)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = np.searchsorted(
            splits, df["c"].to_numpy(np.int64), side="right")
        return df

    tagged = ds.map_batches(with_bucket, batch_format="pandas")
    counts = grouped_agg(tagged, ["bucket"], {"n": (None, "count")},
                         num_buckets=2).to_pandas()
    offs = np.zeros(num_buckets, dtype=np.int64)
    total = 0
    if "bucket" in counts.columns:      # schema-less when input empty
        for r in counts.sort_values("bucket").itertuples():
            offs[int(r.bucket)] = total
            total += int(r.n)
    # SQL NTILE: first (total % tiles) tiles hold base+1 rows
    base, extra = divmod(total, tiles) if total else (0, 0)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, g in df.groupby("bucket"):
            g = g.sort_values(["c", "event_id"], kind="stable")
            rank = np.arange(len(g), dtype=np.int64) + offs[int(b)]
            cut = extra * (base + 1)
            nt = np.where(rank < cut,
                          rank // max(base + 1, 1),
                          extra + (rank - cut) // max(base, 1))
            out.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(np.int64),
                "tile": nt.astype(np.int64) + 1}))
        if not out:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "tile": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    res = grouped_map(tagged, ["bucket"], rank_bucket,
                      num_buckets=num_buckets)
    return ensure_cols(res, {"event_id": "int64", "tile": "int64"})


def daily_pivot(sf_dir: str):
    """PIVOT/crosstab: one row per day, one count column per event
    type — the wide-format reshape of ``daily_counts``. The (day,
    type) aggregate is day×type-bounded, so the reshape itself is a
    driver-side unstack of a tiny frame; the corpus-sized work is the
    same combiner→exchange as the long format. Hash-exact against the
    FILTER-aggregation oracle (types are the five fixed values)."""
    types = ["click", "error", "purchase", "signup", "view"]
    base = _daily(sf_dir).to_pandas()      # days × types rows
    cols = {"day": "datetime64[us]"}
    cols.update({f"n_{t}": "int64" for t in types})
    if not len(base):
        return pd.DataFrame({c: pd.Series(dtype=d)
                             for c, d in cols.items()})
    wide = base.pivot_table(index="day", columns="event_type",
                            values="n", aggfunc="sum",
                            fill_value=0).reset_index()
    out = pd.DataFrame({"day": wide["day"].astype("datetime64[us]")})
    for t in types:
        if t in wide.columns:
            out[f"n_{t}"] = wide[t].astype("int64")
        else:
            out[f"n_{t}"] = np.zeros(len(wide), dtype=np.int64)
    return out.sort_values("day", kind="stable").reset_index(drop=True)


def user_event_seq(sf_dir: str, max_users: int | None = None):
    """Grouped string aggregation (LISTAGG/string_agg): per user, the
    comma-joined sequence of event types in (ts, event_id) order — the
    session-trace collect shape. One user-keyed exchange; each group's
    concat happens in-bucket (bounded by the user's event count).
    Hash-exact against string_agg ORDER BY."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = d.groupby("user_id", sort=False)["event_type"] \
             .agg(",".join).reset_index()
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "seq": g["event_type"].astype(object)})

    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_id",
                                       "event_type"])
    out = grouped_map(ds, ["user_id"], bucket, num_buckets=8)
    from baram_ray.pipelines.util import ensure_cols
    return ensure_cols(out, {"user_id": "int64", "seq": "object"})


def session_error_overlap(sf_dir: str, pad_minutes: int = 30,
                          bin_hours: int = 1, num_buckets: int = 8):
    """INTERVAL-OVERLAP join: for every session, the number of error
    windows (error ts ± ``pad_minutes``) it overlaps — the binned
    interval-join shape Ray Data lacks natively. Both interval sides
    replicate to the fixed time bins they span (replication factor =
    span/bin + 1); overlapping pairs are found in-bin and counted ONLY
    in the bin containing the overlap start (max(session_start, lo)),
    so a pair spanning several bins counts once; each session also
    emits one zero partial in its start bin, keeping zero-overlap
    sessions in the result (left-outer semantics). One bin-keyed
    exchange + one session-keyed aggregate. Hash-exact against the
    LEFT JOIN range-predicate oracle."""
    from baram_ray.pipelines.util import ensure_cols

    sess = sessionize(sf_dir)          # (user_id, start, end, n_events)
    binw = np.int64(bin_hours * 3_600_000_000)          # µs
    pad = np.int64(pad_minutes * 60_000_000)

    def sess_bins(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        s = df["session_start"].to_numpy("datetime64[us]").astype(np.int64)
        e = df["session_end"].to_numpy("datetime64[us]").astype(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        for i in range(len(df)):
            b0, b1 = s[i] // binw, e[i] // binw
            for b in range(int(b0), int(b1) + 1):
                out.append((int(b), int(u[i]), int(s[i]), int(e[i]),
                            b == b0))
        return pd.DataFrame(out, columns=["bin", "user_id", "s", "e",
                                          "is_first"]) \
            if out else pd.DataFrame({
                "bin": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "e": pd.Series(dtype="int64"),
                "is_first": pd.Series(dtype="bool")})

    def err_bins(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["event_type"] == "error"]
        t = d["ts"].to_numpy("datetime64[us]").astype(np.int64)
        lo, hi = t - pad, t + pad
        out = []
        for i in range(len(d)):
            for b in range(int(lo[i] // binw), int(hi[i] // binw) + 1):
                out.append((int(b), int(lo[i]), int(hi[i])))
        return pd.DataFrame(out, columns=["bin", "lo", "hi"]) \
            if out else pd.DataFrame({
                "bin": pd.Series(dtype="int64"),
                "lo": pd.Series(dtype="int64"),
                "hi": pd.Series(dtype="int64")})

    left = sess.map_batches(sess_bins, batch_format="pandas")
    right = read_table(sf_dir, "events", ["event_type", "ts"]) \
        .map_batches(err_bins, batch_format="pandas")

    from baram_ray.util import cogroup

    def bucket(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(ldf):
            lo = rdf["lo"].to_numpy(np.int64)
            hi = rdf["hi"].to_numpy(np.int64)
            rbin = rdf["bin"].to_numpy(np.int64) if len(rdf) else lo
            for r in ldf.itertuples(index=False):
                if len(rdf):
                    # a hash bucket holds several bins: pair each
                    # session replica only with THIS bin's window
                    # replicas, else multi-bin windows count twice
                    m = (rbin == r.bin) & (r.s <= hi) & (r.e >= lo)
                    # count only pairs whose overlap START is in this bin
                    ostart = np.maximum(np.int64(r.s), lo[m])
                    n = int((ostart // binw == r.bin).sum())
                else:
                    n = 0
                if n or r.is_first:
                    rows.append((r.user_id, r.s, r.e, n))
        return pd.DataFrame(rows, columns=["user_id", "s", "e", "n"]) \
            if rows else pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "e": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64")})

    part = cogroup(left, right, ["bin"], bucket, num_buckets=num_buckets)
    agg = grouped_agg(part, ["user_id", "s", "e"], {"n": ("n", "sum")},
                      num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "session_start": df["s"].astype("datetime64[us]"),
            "session_end": df["e"].astype("datetime64[us]"),
            "n_error_windows": df["n"].astype("int64")})

    return ensure_cols(agg.map_batches(finish, batch_format="pandas"),
                       {"user_id": "int64",
                        "session_start": "datetime64[us]",
                        "session_end": "datetime64[us]",
                        "n_error_windows": "int64"})
