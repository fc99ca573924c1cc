"""JSON query DSL — the OpenSearch-style request body the reference
POSTs to its backend (``src/embedding/mod.rs:470-539`` builds exactly
this shape: a ``bool`` with ``should`` match clauses,
``minimum_should_match``, ``filter`` term/range clauses, ``min_score``
and ``size``), re-expressed as a router onto this engine's exact ops.

Supported body::

    {"query": <node>, "size": 10, "min_score": 0.5,
     "sort": [{"col": {"order": "desc"}}] | "col",
     "collapse": {"field": "col"},
     "rescore": {"window_size": 50, "query": {
         "rescore_query": <leaf or bool node>,
         "query_weight": 1.0, "rescore_query_weight": 1.0}},
     "search_after": [score, doc_id],          # plain match; with
                                               # "sort": the composite
                                               # (sort_value, doc_id)
                                               # cursor
     "aggs": {"name": {"terms": {"field": "col", "size": n,
                                 "aggs": {metric sub-aggs per bucket
                                          | ONE top_hits sub-agg}}}
              | {"histogram": {"field": "col", "interval": i}}
              | {"date_histogram": {"field": "epoch_day_col",
                                    "calendar_interval": "month"
                                    | "fixed_interval": days}}
              | {"range": {"field": c, "ranges": [{"from":a,"to":b}]}}
              | {"percentiles": {"field": c, "percents": [...]}}
              | {"filters": {"filters": {name: <query node>}}}
              | {"composite": {"sources": [{name: {"terms":
                    {"field": c}}}], "size": n,
                    "after": {name: value}}}  # paginated buckets
              | {"significant_text": {"field": c, "size": n,
                                      "min_doc_count": m}}
              | {"date_range": {"field": c, "ranges":
                    [{"from": "2020-07-01", "to": "2021-01-01"}]}}
              | {"adjacency_matrix": {"filters": {name: <node>}}}
              | {"global": {}, "aggs": {...}}   # whole live corpus
              | {"missing": {"field": c}}       # null-count
              | {"stats" | "min" | "max" | "avg" | "sum"
                 | "value_count"
                 | "cardinality": {"field": "col"
                    [, "precision_threshold": n]}}}}  # HLL opt-in

    {"ids": {"values": [..]}} and {"exists": {"field": c}} are also
    query nodes (constant-score hits / filter context).

Pipeline aggregations (OpenSearch parent/sibling pipelines)::

    # parent pipelines nest under terms / histogram / date_histogram
    # (derivative-family: histogram/date_histogram only), referencing
    # sibling sub-aggs or _count via "buckets_path":
    {"aggs": {"per_mo": {"date_histogram": {...}, "aggs": {
        "chars": {"sum": {"field": "n_chars"}},
        "d":   {"derivative":     {"buckets_path": "chars"}},
        "cum": {"cumulative_sum": {"buckets_path": "_count"}},
        "ma":  {"moving_fn": {"buckets_path": "_count", "window": 3,
                 "script": "MovingFunctions.unweightedAvg(values)",
                 "shift": 0}},     # window ends BEFORE current bucket
        "sd":  {"serial_diff":    {"buckets_path": "chars", "lag": 2}},
        "r":   {"bucket_script":  {"buckets_path": {"a": "chars",
                                                    "b": "_count"},
                                   "script": "params.a / params.b"}},
        "keep": {"bucket_selector": {"buckets_path": {"c": "_count"},
                                     "script": "params.c > 5"}},
        "cut": {"bucket_sort": {"sort": [{"r": {"order": "desc"}}],
                                "from": 0, "size": 10}}}}}}
    # sibling pipelines reduce a computed bucket agg at the SAME level:
    {"aggs": {"per_mo": {"date_histogram": {...}},
              "best": {"max_bucket": {"buckets_path":
                                      "per_mo>_count"}},
              "tot": {"stats_bucket": {"buckets_path":
                                       "per_mo>_count"}}}}

date_histogram also accepts nested METRIC sub-aggs (stats/min/max/avg/
sum/value_count), served by one vectorized date-bucketed grouped-stats
pass per field (exact per-shard merge).

Any scoring leaf accepts ``"boost": w`` (OpenSearch clause boost —
scales that clause's BM25 contribution; routed through
``search_compound``). ``{"match_all": {}}`` is valid with ``aggs``
(aggregate the whole live corpus, OpenSearch's size:0 analytics
shape). A body with ``aggs`` returns ``{"hits": [...],
"aggregations": {name: [{"key": .., "doc_count": ..}, ...]}}``.

Query nodes::

    {"match": "text"} | {"match": {"query": "text"}}
    {"match": {"query": "text", "operator": "or" | "and",
               "synonyms": {"tok": ["syn1", ...]}}}  # SynonymQuery
                                        # blended df/tf per group
    {"match_phrase": "a b"} | {"match_phrase": {"query": "a b",
                                                "slop": 1}}
    {"match_phrase_prefix": "a b"} | {"match_phrase_prefix":
        {"query": "a b", "max_expansions": 50}}  # last term = prefix
    {"dis_max": {"queries": [leaf nodes], "tie_breaker": 0.3}}
    {"boosting": {"positive": <node>, "negative": <node>,
                  "negative_boost": 0.5}}  # demote, don't exclude
    {"constant_score": {"filter": [term/range/match nodes],
                        "boost": 1.2}}
    {"function_score": {"query": match | bool-filter | match_all,
                        "field_value_factor": {"field": c,
                            "factor": f, "modifier": "ln1p"},
                        "boost_mode": "replace" | "multiply"}}
    {"prefix": "pre"} | {"prefix": {"value": "pre",
                                    "max_expansions": 50}}
    {"wildcard": "w?ld*"} | {"wildcard": {"value": ...,
                                          "max_expansions": 50}}
    {"regexp": "ab[cd]+"} | {"regexp": {"value": ...,
                                        "max_expansions": 50}}
    {"fuzzy": "term"} | {"fuzzy": {"value": ..., "fuzziness": 1|"AUTO",
                                   "prefix_length": 0,
                                   "max_expansions": 50}}
    {"query_string": {"query": "+a -b \"c d\""}}   # qparse surface
    {"multi_match": {"query": "text",              # field subset with
                     "fields": ["content^2",       # ^boost suffixes;
                                "path"],           # top-level only
                     "type": "most_fields"         # per-field SUM
                     | "best_fields",              # dis_max per field
                     "tie_breaker": 0.0}}
    {"span_near": {"clauses": [{"span_term": {"text": "a"}}, ...],
                   "slop": 2, "in_order": true}}   # Lucene spans
    {"span_first": {"match": {"span_term": {"text": "a"}}, "end": 3}}
    {"span_not": {"include": {"span_term": ...},
                  "exclude": {"span_term": ...}, "dist": 1}}
    {"term": {"col": value}}                       # filter context
    {"terms": {"col": [v1, v2]}}                   # filter context (IN)
    {"range": {"col": {"gte": ..., "lt": ...}}}    # filter context
    {"bool": {"must": [...], "should": [...], "must_not": [...],
              "filter": [...], "minimum_should_match": n}}

Routing keeps the bit-identity discipline of ``qparse``: a body that
denotes ONE dedicated op executes exactly as the explicit API call; a
mixed-kind ``bool`` routes to ``search_compound`` (whose per-clause
scoring is score-identical to the dedicated ops — tested). ``term`` /
``range`` inside ``must``/``filter`` become metadata filters (the
reference puts them in ``filter``; OpenSearch's must-context scoring
for them is a constant 0/1 that never reorders BM25 sums). Shapes the
engine genuinely does not express (field-subset match, scoring ``term``
in should, match_all without aggs) raise ``ValueError`` with the explicit-API
spelling — an honest boundary, not silently-wrong scoring.
"""
from __future__ import annotations

from typing import Any

import numpy as np

_LEAF_KINDS = ("match", "match_phrase", "match_phrase_prefix",
               "multi_match", "prefix", "wildcard", "regexp", "fuzzy",
               "query_string", "term", "terms", "range", "match_all",
               "bool", "dis_max", "constant_score", "function_score",
               "boosting", "span_near", "span_first", "span_not",
               "ids", "exists", "script_score")


def _span_term(node) -> str:
    """A span_term clause → its term: accepts a bare string,
    ``{"span_term": {"field": "term"}}`` and
    ``{"span_term": {"field": {"value": "term"}}}`` (the OpenSearch
    shapes)."""
    if isinstance(node, str):
        return node
    if isinstance(node, dict) and "span_term" in node:
        v = node["span_term"]
        if isinstance(v, str):
            return v
        if isinstance(v, dict) and len(v) == 1:
            (_, t), = v.items()
            if isinstance(t, str):
                return t
            if isinstance(t, dict) and "value" in t:
                return str(t["value"])
    raise ValueError(f"bad span_term clause: {node!r}")


def _parse_field_boosts(fields) -> tuple[list[str],
                                         dict[str, float] | None]:
    """OpenSearch field list with ``^boost`` suffixes →
    (field subset, per-field boosts dict or None)."""
    if not fields or not isinstance(fields, list):
        raise ValueError("multi_match needs a non-empty 'fields' list")
    names, boosts = [], {}
    for f in fields:
        name, _, w = str(f).partition("^")
        names.append(name)
        if w:
            boosts[name] = float(w)
    return names, boosts or None


def _node_kind(node: dict) -> str:
    if not isinstance(node, dict):
        raise ValueError(f"query node must be a dict, got {node!r}")
    kinds = [k for k in _LEAF_KINDS if k in node]
    if len(kinds) != 1:
        raise ValueError(
            f"query node needs exactly one of {_LEAF_KINDS}: "
            f"{sorted(node)}")
    return kinds[0]


def _text_arg(v, key: str = "query") -> dict:
    """Normalize a leaf body: a bare string means {key: string}."""
    if isinstance(v, str):
        return {key: v}
    if isinstance(v, dict):
        if key not in v:
            raise ValueError(f"leaf body needs '{key}': {v!r}")
        return v
    raise ValueError(f"bad leaf body {v!r}")


def _leaf_spec(kind: str, v) -> dict:
    """Leaf node → search_compound clause spec. A ``boost`` key on the
    leaf body passes through as the clause boost."""
    spec = _leaf_spec_inner(kind, v)
    if isinstance(v, dict) and v.get("boost") is not None:
        spec["boost"] = float(v["boost"])
    return spec


def _leaf_spec_inner(kind: str, v) -> dict:
    if kind == "match":
        return {"match": _text_arg(v)["query"]}
    if kind == "match_phrase":
        d = _text_arg(v)
        spec = {"phrase": d["query"], "slop": int(d.get("slop", 0))}
        if d.get("fields"):
            spec["fields"] = list(d["fields"])
        return spec
    if kind == "match_phrase_prefix":
        d = _text_arg(v)
        spec = {"phrase_prefix": d["query"],
                "max_expansions": int(d.get("max_expansions", 50))}
        if d.get("fields"):
            spec["fields"] = list(d["fields"])
        return spec
    if kind == "prefix":
        d = _text_arg(v, "value")
        return {"prefix": d["value"],
                "max_expansions": int(d.get("max_expansions", 50))}
    if kind == "wildcard":
        d = _text_arg(v, "value")
        return {"wildcard": d["value"],
                "max_expansions": int(d.get("max_expansions", 50))}
    if kind == "regexp":
        d = _text_arg(v, "value")
        return {"regexp": d["value"],
                "max_expansions": int(d.get("max_expansions", 50))}
    if kind == "fuzzy":
        d = _text_arg(v, "value")
        fz = d.get("fuzziness", "AUTO")
        return {"fuzzy": d["value"],
                "max_edits": None if (isinstance(fz, str)
                                      and fz.upper() == "AUTO")
                else int(fz),
                "prefix_length": int(d.get("prefix_length", 0)),
                "max_expansions": int(d.get("max_expansions", 50))}
    if kind == "multi_match":
        raise ValueError("multi_match is top-level only (routed by "
                         "execute_dsl) — inside bool, use match "
                         "clauses with per-field boosts")
    raise ValueError(f"{kind} is not a scoring clause here — "
                     "term/range belong in bool.filter")


def _filter_entry(kind: str, v) -> tuple[str, Any]:
    """term/terms/range/exists node → (column, engine filter value)."""
    if kind == "exists":
        if not isinstance(v, dict) or "field" not in v:
            raise ValueError(f"exists needs a 'field': {v!r}")
        return v["field"], {"exists": True}
    if not isinstance(v, dict) or len(v) != 1:
        raise ValueError(f"{kind} needs exactly one column: {v!r}")
    col, val = next(iter(v.items()))
    if kind == "term":
        if isinstance(val, dict):          # {"value": x} long form
            val = val.get("value")
        return col, val
    if kind == "terms":                    # value IN list
        if not isinstance(val, list) or not val:
            raise ValueError(f"terms needs a non-empty list: {val!r}")
        return col, list(val)
    bad = set(val) - {"gte", "lte", "gt", "lt"}
    if not isinstance(val, dict) or bad:
        raise ValueError(f"range supports gte/lte/gt/lt: {val!r}")
    return col, dict(val)


class DslPlan:
    """Flattened body: typed scoring clauses by polarity + filters."""

    def __init__(self):
        self.must: list[dict] = []
        self.should: list[dict] = []
        self.must_not: list[dict] = []
        self.filters: dict = {}
        self.minimum_should_match: int | None = None

    @property
    def specs(self) -> list[dict]:
        return self.must + self.should + self.must_not


def parse_query(node: dict) -> DslPlan:
    """Query node → DslPlan (pure; no engine access)."""
    plan = DslPlan()
    kind = _node_kind(node)
    if kind == "bool":
        b = node["bool"]
        if b.get("minimum_should_match") is not None:
            plan.minimum_should_match = int(b["minimum_should_match"])

        def each(group):
            v = b.get(group) or []
            return v if isinstance(v, list) else [v]

        for c in each("filter"):
            ck = _node_kind(c)
            if ck not in ("term", "terms", "range", "exists"):
                raise ValueError(
                    f"filter context supports term/terms/range/"
                    f"exists, got {ck}")
            col, val = _filter_entry(ck, c[ck])
            plan.filters[col] = val
        for group, sink in (("must", plan.must),
                            ("should", plan.should),
                            ("must_not", plan.must_not)):
            for c in each(group):
                ck = _node_kind(c)
                if ck in ("term", "terms", "range", "exists"):
                    if group != "must":
                        raise ValueError(
                            f"{ck} in {group} has no BM25 score on "
                            "this engine — put it in bool.filter "
                            "(must) or use the explicit filters API")
                    col, val = _filter_entry(ck, c[ck])
                    plan.filters[col] = val
                    continue
                if ck == "bool":
                    raise ValueError(
                        "nested bool reached the flat planner — "
                        "execute_dsl routes it to search_bool_tree; "
                        "call that (or the DSL) instead")
                if ck == "query_string":
                    raise ValueError(
                        "nested query_string inside bool is not "
                        "supported — flatten the clauses or call the "
                        "explicit API")
                sink.append(_leaf_spec(ck, c[ck]))
        return plan
    if kind in ("term", "terms", "range"):
        raise ValueError(
            f"top-level {kind} has no ranking — wrap it in bool.filter "
            "with a scoring clause, or use facets()/search_sorted()")
    if kind == "match_all":
        return plan                      # empty plan: aggs-only bodies
    if kind in ("query_string", "dis_max", "constant_score",
                "function_score", "boosting"):
        raise ValueError(f"{kind} is routed by execute_dsl")
    plan.should.append(_leaf_spec(kind, node[kind]))
    return plan


_AGG_KINDS = ("terms", "histogram", "date_histogram", "stats", "range",
              "cardinality", "min", "max", "avg", "sum", "value_count",
              "percentiles", "significant_text", "significant_terms",
              "composite", "filters", "date_range", "adjacency_matrix",
              "global", "missing", "extended_stats", "weighted_avg",
              "multi_terms", "rare_terms", "percentile_ranks",
              "boxplot", "sampler")


_METRIC_SUBAGGS = ("stats", "min", "max", "avg", "sum", "value_count")


def _terms_with_subaggs(engine, name: str, by: str, sub: dict,
                        text: str, filters: dict | None) -> list[dict]:
    """terms bucket agg with nested METRIC sub-aggregations
    (stats/min/max/avg/sum/value_count): one vectorized grouped-stats
    pass per distinct sub-agg field, assembled into per-bucket
    results. Bucket ordering (count desc, key asc) and counts are
    identical to the plain terms agg."""
    per_field: dict[str, dict] = {}
    for sname, sspec in sub.items():
        kinds = [a for a in _METRIC_SUBAGGS if a in sspec]
        if len(kinds) != 1:
            raise ValueError(
                f"sub-agg '{name}.{sname}' must be one metric of "
                f"{_METRIC_SUBAGGS}: {sspec!r}")
        per_field.setdefault(sspec[kinds[0]]["field"], {})[sname] = \
            kinds[0]
    grouped = {f: engine.facet_group_stats(text, by, f,
                                           filters=filters)
               for f in per_field}
    first = grouped[next(iter(grouped))]
    buckets = [{"key": v, "doc_count": c} for v, c, *_ in first]
    for f, names in per_field.items():
        stats_by_val = {v: {"count": c, "min": lo, "max": hi,
                            "sum": tot, "avg": avg}
                        for v, c, lo, hi, tot, avg in grouped[f]}
        for b in buckets:
            s = stats_by_val[b["key"]]
            for sname, skind in names.items():
                b[sname] = (dict(s) if skind == "stats" else
                            {"value": s["count"]
                             if skind == "value_count" else s[skind]})
    return buckets


def _next_bucket_key(day: int, body: dict) -> int:
    """The epoch-day key of the NEXT date_histogram bucket after
    ``day`` (same truncation rules as the engine)."""
    cal = body.get("calendar_interval")
    if cal is None:
        return day + int(body["fixed_interval"])
    d = np.int64(day).astype("datetime64[D]")
    if cal == "day":
        return day + 1
    if cal == "week":
        return day + 7
    step = {"month": 1, "quarter": 3, "year": 12}[cal]
    m = d.astype("datetime64[M]") + np.timedelta64(step, "M")
    return int(m.astype("datetime64[D]").astype(np.int64))


def _fill_empty_date_buckets(buckets: list[dict],
                             body: dict) -> list[dict]:
    """date_histogram ``min_doc_count: 0``: zero-count buckets fill
    every gap in the key range (the dashboard contract — derivatives
    and moving windows need the dense series). ``extended_bounds``
    {"min": iso, "max": iso} widens the range deterministically; the
    bounds truncate to bucket keys first, like OpenSearch."""
    eb = body.get("extended_bounds") or {}

    def _day(s):
        return int(np.datetime64(str(s), "D").astype(np.int64))

    def _trunc(day: int) -> int:
        cal = body.get("calendar_interval")
        if cal is None:
            n = int(body["fixed_interval"])
            return (day // n) * n
        from baram_ray.query.engine import QueryEngine
        return int(QueryEngine._calendar_trunc(
            np.array([day], dtype=np.int64), cal)[0])

    keys = [b["key"] for b in buckets]
    lo = min(keys) if keys else None
    hi = max(keys) if keys else None
    if "min" in eb:
        lo = _trunc(_day(eb["min"])) if lo is None else \
            min(lo, _trunc(_day(eb["min"])))
    if "max" in eb:
        hi = _trunc(_day(eb["max"])) if hi is None else \
            max(hi, _trunc(_day(eb["max"])))
    if lo is None:
        return buckets
    by_key = {b["key"]: b for b in buckets}
    out = []
    k = lo
    while k <= hi:
        b = by_key.get(k)
        if b is None:
            iso = str(np.int64(k).astype("datetime64[D]"))
            b = {"key_as_string": iso, "key": int(k), "doc_count": 0}
        out.append(b)
        k = _next_bucket_key(k, body)
    return out


def _date_histogram_with_subaggs(engine, name: str, fld: str,
                                 body: dict, sub: dict, text: str,
                                 filters: dict | None) -> list[dict]:
    """date_histogram with nested METRIC sub-aggregations: one
    vectorized date-bucketed grouped-stats pass per distinct sub-agg
    field (``facet_date_group_stats``), assembled into per-bucket
    results. Bucket keys/counts identical to the plain
    date_histogram."""
    per_field: dict[str, dict] = {}
    for sname, sspec in sub.items():
        kinds = [a for a in _METRIC_SUBAGGS if a in sspec]
        if len(kinds) != 1:
            raise ValueError(
                f"sub-agg '{name}.{sname}' must be one metric of "
                f"{_METRIC_SUBAGGS}: {sspec!r}")
        per_field.setdefault(sspec[kinds[0]]["field"], {})[sname] = \
            kinds[0]
    kw = dict(calendar_interval=body.get("calendar_interval"),
              fixed_interval=body.get("fixed_interval"),
              filters=filters)
    grouped = {f: engine.facet_date_group_stats(text, fld, f, **kw)
               for f in per_field}
    first = grouped[next(iter(grouped))]
    buckets = [{"key_as_string": s, "key": u, "doc_count": c}
               for s, u, c, *_ in first]
    for f, names in per_field.items():
        stats_by_key = {u: {"count": c, "min": lo, "max": hi,
                            "sum": tot, "avg": avg}
                        for _, u, c, lo, hi, tot, avg in grouped[f]}
        for b in buckets:
            s = stats_by_key[b["key"]]
            for sname, skind in names.items():
                b[sname] = (dict(s) if skind == "stats" else
                            {"value": s["count"]
                             if skind == "value_count" else s[skind]})
    return buckets


# ---------------------------------------------------------------------------
# Pipeline aggregations (OpenSearch parent/sibling pipeline aggs).
# Parent pipelines post-process an ordered bucket list (derivative /
# cumulative_sum / moving_fn / serial_diff / bucket_script /
# bucket_selector / bucket_sort); sibling pipelines (avg_bucket /
# sum_bucket / min_bucket / max_bucket / stats_bucket) reduce a sibling
# bucket agg's per-bucket values to one result. All are pure driver-side
# arithmetic over the (already tiny) bucket lists — the distributed
# work happened in the bucket agg itself.

_PIPELINE_SUBAGGS = ("derivative", "cumulative_sum", "moving_fn",
                     "serial_diff", "bucket_script", "bucket_selector",
                     "bucket_sort")
_SIBLING_AGGS = ("avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
                 "stats_bucket")
# derivative-family pipelines need the parent's buckets in key order —
# OpenSearch likewise restricts them to the histogram family.
_ORDERED_ONLY = ("derivative", "cumulative_sum", "moving_fn",
                 "serial_diff")

_MOVING_FNS = {
    "MovingFunctions.unweightedAvg(values)":
        lambda w: sum(w) / len(w),
    "MovingFunctions.sum(values)": lambda w: sum(w),
    "MovingFunctions.min(values)": lambda w: min(w),
    "MovingFunctions.max(values)": lambda w: max(w),
}


def _bucket_value(bucket: dict, path: str):
    """Resolve an OpenSearch ``buckets_path`` against one bucket:
    ``_count`` → doc_count; ``name`` / ``name.value`` → a metric or
    earlier-pipeline sub-agg value; ``name.stat`` → a stats field."""
    if path == "_count":
        return bucket["doc_count"]
    name, _, attr = path.partition(".")
    if name not in bucket:
        return None
    v = bucket[name]
    if isinstance(v, dict):
        return v.get(attr or "value")
    return v


def script_param_names(src: str) -> list[str]:
    """The ``params.<name>`` attributes a script references (for
    binding engine columns in script_score)."""
    import ast
    out = []
    for node in ast.walk(ast.parse(src.strip(), mode="eval")):
        if (isinstance(node, ast.Attribute)
                and isinstance(node.value, ast.Name)
                and node.value.id == "params"):
            out.append(node.attr)
    return sorted(set(out))


def _eval_script(src: str, params: dict, arith_only: bool = False):
    """Safe arithmetic/comparison evaluator for bucket_script /
    bucket_selector bodies (the ``params.x`` Painless subset the
    reference's dashboards use). AST-whitelisted: numbers, params
    attributes, + - * / % **, unary +/-, comparisons, and/or/not,
    parentheses. Anything else (calls, subscripts, names other than
    ``params``) raises ValueError — never handed to eval().
    ``arith_only=True`` additionally refuses comparisons/boolean ops —
    the script_score mode, where params are NUMPY COLUMNS and every
    allowed operator is element-wise (one vectorized pass, no per-doc
    loop)."""
    import ast

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float)):
                return node.value
            raise ValueError(f"non-numeric constant {node.value!r}")
        if isinstance(node, ast.Attribute):
            if (isinstance(node.value, ast.Name)
                    and node.value.id == "params"):
                if node.attr not in params:
                    raise ValueError(f"unknown param {node.attr!r}")
                return params[node.attr]
            raise ValueError("only params.<name> attributes allowed")
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand)
            if isinstance(node.op, ast.USub):
                return -v
            if isinstance(node.op, ast.UAdd):
                return +v
            if isinstance(node.op, ast.Not):
                if arith_only:
                    raise ValueError("script_score scripts are "
                                     "arithmetic-only (no not)")
                return not v
            raise ValueError("bad unary op")
        if isinstance(node, ast.BinOp):
            a, b = ev(node.left), ev(node.right)
            ops = {ast.Add: lambda: a + b, ast.Sub: lambda: a - b,
                   ast.Mult: lambda: a * b, ast.Div: lambda: a / b,
                   ast.Mod: lambda: a % b, ast.Pow: lambda: a ** b,
                   ast.FloorDiv: lambda: a // b}
            for t, f in ops.items():
                if isinstance(node.op, t):
                    return f()
            raise ValueError("bad binary op")
        if isinstance(node, ast.Compare):
            if arith_only:
                raise ValueError("script_score scripts are "
                                 "arithmetic-only (no comparisons)")
            left = ev(node.left)
            for op, cmp in zip(node.ops, node.comparators):
                right = ev(cmp)
                ok = {ast.Gt: left > right, ast.GtE: left >= right,
                      ast.Lt: left < right, ast.LtE: left <= right,
                      ast.Eq: left == right,
                      ast.NotEq: left != right}.get(type(op))
                if ok is None:
                    raise ValueError("bad comparison op")
                if not ok:
                    return False
                left = right
            return True
        if isinstance(node, ast.BoolOp):
            if arith_only:
                raise ValueError("script_score scripts are "
                                 "arithmetic-only (no and/or)")
            vals = [ev(v) for v in node.values]
            return (all(vals) if isinstance(node.op, ast.And)
                    else any(vals))
        raise ValueError(
            f"disallowed script construct {type(node).__name__}")

    return ev(ast.parse(src.strip(), mode="eval"))


def _script_params(bucket: dict, paths) -> dict | None:
    """buckets_path dict (or single string → param 'value') resolved
    against one bucket; None if any referenced value is missing
    (OpenSearch gap_policy=skip)."""
    if isinstance(paths, str):
        paths = {"value": paths}
    out = {}
    for pname, path in paths.items():
        v = _bucket_value(bucket, path)
        if v is None:
            return None
        out[pname] = v
    return out


def _apply_pipeline_subaggs(buckets: list[dict], pipes: dict,
                            parent_kind: str) -> list[dict]:
    """Apply parent pipeline sub-aggs to an ordered bucket list, in
    body order (later pipelines may reference earlier ones via
    buckets_path). Value producers first write ``{"value": v}`` into
    each bucket (first-bucket derivative / out-of-window moving_fn
    buckets are skipped, the OpenSearch convention);
    ``bucket_selector`` then filters, ``bucket_sort`` reorders/cuts
    last."""
    selector = sorter = None
    for name, spec in pipes.items():
        (kind, body), = spec.items()
        if kind in _ORDERED_ONLY and parent_kind not in (
                "date_histogram", "histogram"):
            raise ValueError(
                f"{kind} needs a histogram-family parent agg, not "
                f"{parent_kind} (OpenSearch's histogram-only rule)")
        if kind == "bucket_selector":
            selector = (name, body)
            continue
        if kind == "bucket_sort":
            sorter = (name, body)
            continue
        if kind == "derivative":
            vals = [_bucket_value(b, body["buckets_path"])
                    for b in buckets]
            for i, b in enumerate(buckets):
                if i and vals[i] is not None and vals[i - 1] is not None:
                    b[name] = {"value": vals[i] - vals[i - 1]}
        elif kind == "cumulative_sum":
            total = 0
            for b in buckets:
                v = _bucket_value(b, body["buckets_path"])
                total += v if v is not None else 0
                b[name] = {"value": total}
        elif kind == "serial_diff":
            lag = int(body.get("lag", 1))
            vals = [_bucket_value(b, body["buckets_path"])
                    for b in buckets]
            for i, b in enumerate(buckets):
                if (i >= lag and vals[i] is not None
                        and vals[i - lag] is not None):
                    b[name] = {"value": vals[i] - vals[i - lag]}
        elif kind == "moving_fn":
            fn = _MOVING_FNS.get(str(body.get("script", "")).strip())
            if fn is None:
                raise ValueError(
                    "moving_fn script must be one of "
                    f"{sorted(_MOVING_FNS)}")
            w = int(body["window"])
            # OpenSearch: window is the w buckets ENDING at i+shift
            # (exclusive) — shift=0 (default) excludes the current
            # bucket, shift=1 includes it.
            shift = int(body.get("shift", 0))
            vals = [_bucket_value(b, body["buckets_path"])
                    for b in buckets]
            for i, b in enumerate(buckets):
                win = [v for v in vals[max(0, i + shift - w):
                                       max(0, i + shift)]
                       if v is not None]
                if win:
                    b[name] = {"value": fn(win)}
        elif kind == "bucket_script":
            for b in buckets:
                p = _script_params(b, body["buckets_path"])
                if p is not None:
                    b[name] = {"value": _eval_script(body["script"], p)}
        else:
            raise ValueError(f"unknown pipeline sub-agg {kind!r}")
    if selector is not None:
        _, body = selector
        kept = []
        for b in buckets:
            p = _script_params(b, body["buckets_path"])
            if p is not None and _eval_script(body["script"], p):
                kept.append(b)
        buckets = kept
    if sorter is not None:
        _, body = sorter
        for s in reversed(body.get("sort", [])):
            (path, how), = (s.items() if isinstance(s, dict)
                            else ((s, {}),))
            desc = (how.get("order", "asc") == "desc"
                    if isinstance(how, dict) else False)
            buckets.sort(key=lambda b: _bucket_value(b, path)
                         if _bucket_value(b, path) is not None
                         else float("-inf" if desc else "inf"),
                         reverse=desc)
        frm = int(body.get("from", 0))
        size = body.get("size")
        buckets = (buckets[frm:frm + int(size)] if size is not None
                   else buckets[frm:])
    return buckets


def _split_subaggs(sub: dict | None) -> tuple[dict, dict]:
    """Partition a sub-agg dict into (metric/top_hits, pipeline)."""
    if not sub:
        return {}, {}
    pipes = {n: s for n, s in sub.items()
             if any(k in s for k in _PIPELINE_SUBAGGS)}
    rest = {n: s for n, s in sub.items() if n not in pipes}
    return rest, pipes


def _run_sibling_agg(kind: str, body: dict, out_aggs: dict):
    """Sibling pipeline agg: ``buckets_path: "parent>metric"`` reduces
    the already-computed parent bucket list (``_count`` or a metric
    sub-agg name after ``>``)."""
    parent, _, metric = str(body["buckets_path"]).partition(">")
    if parent not in out_aggs:
        raise ValueError(f"sibling buckets_path parent {parent!r} not "
                         "among the computed aggs")
    buckets = out_aggs[parent]
    if isinstance(buckets, dict):
        buckets = buckets.get("buckets")
    if not isinstance(buckets, list):
        raise ValueError("sibling pipeline needs a bucket-list parent")
    vals = [v for v in (_bucket_value(b, metric or "_count")
                        for b in buckets) if v is not None]
    if not vals:
        return {"value": None}
    if kind == "stats_bucket":
        return {"count": len(vals), "min": min(vals), "max": max(vals),
                "sum": sum(vals), "avg": sum(vals) / len(vals)}
    if kind == "avg_bucket":
        return {"value": sum(vals) / len(vals)}
    if kind == "sum_bucket":
        return {"value": sum(vals)}
    if kind == "min_bucket":
        return {"value": min(vals)}
    return {"value": max(vals)}


def _run_agg(engine, name: str, spec: dict, text: str,
             filters: dict | None):
    """One named aggregation body → its OpenSearch-shaped result:
    bucket aggs (terms / histogram / range) return a list of bucket
    dicts; stats returns the 5-field dict; single-value metrics
    (min/max/avg/sum/value_count, cardinality) return {"value": v}."""
    kinds = [a for a in _AGG_KINDS if a in spec]
    if len(kinds) != 1:
        raise ValueError(
            f"agg '{name}' needs exactly one of {_AGG_KINDS}: {spec!r}")
    kind = kinds[0]
    body = spec[kind]
    fld = body.get("field")
    if kind == "terms":
        sub, pipes = _split_subaggs(
            spec.get("aggs", spec.get("aggregations")))
        if sub and len(sub) == 1 and "top_hits" in next(iter(
                sub.values())):
            sname, th = next(iter(sub.items()))
            th = th["top_hits"]
            col, ascending = _sort_key(th.get("sort", "doc_id"))
            buckets = [
                {"key": b["key"], "doc_count": b["doc_count"],
                 sname: b["hits"]}
                for b in engine.facet_top_hits(
                    text, fld, col, size=int(th.get("size", 3)),
                    ascending=ascending, filters=filters)]
        elif sub:
            buckets = _terms_with_subaggs(engine, name, fld, sub,
                                          text, filters)
        else:
            rows = engine.facets(text, [fld], filters=filters)
            buckets = [{"key": v, "doc_count": c} for _, v, c in rows]
        sz = body.get("size")
        buckets = buckets[:int(sz)] if sz else buckets
        if pipes:
            buckets = _apply_pipeline_subaggs(buckets, pipes, "terms")
        return buckets
    if kind == "histogram":
        rows = engine.facet_histogram(text, fld,
                                      float(body["interval"]),
                                      filters=filters)
        buckets = [{"key": b, "doc_count": c} for b, c in rows]
        sub, pipes = _split_subaggs(
            spec.get("aggs", spec.get("aggregations")))
        if sub:
            raise ValueError("histogram supports pipeline sub-aggs "
                             "only — metric sub-aggs ride "
                             "date_histogram or terms")
        if pipes:
            buckets = _apply_pipeline_subaggs(buckets, pipes,
                                              "histogram")
        return buckets
    if kind == "date_histogram":
        sub, pipes = _split_subaggs(
            spec.get("aggs", spec.get("aggregations")))
        if sub:
            buckets = _date_histogram_with_subaggs(
                engine, name, fld, body, sub, text, filters)
        else:
            rows = engine.facet_date_histogram(
                text, fld,
                calendar_interval=body.get("calendar_interval"),
                fixed_interval=body.get("fixed_interval"),
                filters=filters)
            buckets = [{"key_as_string": s, "key": u, "doc_count": c}
                       for s, u, c in rows]
        if int(body.get("min_doc_count", 1)) == 0:
            buckets = _fill_empty_date_buckets(buckets, body)
        if pipes:
            buckets = _apply_pipeline_subaggs(buckets, pipes,
                                              "date_histogram")
        return buckets
    if kind == "percentiles":
        vals = engine.facet_percentiles(
            text, fld, percents=body.get("percents"), filters=filters)
        return {"values": vals}
    if kind in ("significant_text", "significant_terms"):
        rows = engine.facet_significant_text(
            text, size=int(body.get("size", 10)),
            min_doc_count=int(body.get("min_doc_count", 3)),
            field=fld, filters=filters)
        return [{"key": t, "doc_count": fg, "bg_count": bg,
                 "score": s} for t, fg, bg, s in rows]
    if kind == "filters":
        sub = body.get("filters")
        if not isinstance(sub, dict) or not sub:
            raise ValueError("filters agg needs a non-empty "
                             "'filters' dict of named query nodes")
        rows = engine.facet_filters(text, sub, filters=filters)
        return {"buckets": {name: {"doc_count": c}
                            for name, c in rows}}
    if kind == "composite":
        names, flds = [], []
        if not body.get("sources"):
            raise ValueError("composite needs a non-empty 'sources' "
                             "list")
        for src in body["sources"]:
            (sname, sspec), = src.items()
            names.append(sname)
            flds.append(sspec["terms"]["field"])
        after = body.get("after")
        if after is not None:
            after = tuple(after[nm] for nm in names)
        buckets = engine.facet_composite(
            text, flds, size=int(body.get("size", 10)), after=after,
            filters=filters)
        out = [{"key": dict(zip(names, (b["key"][f] for f in flds))),
                "doc_count": b["doc_count"]} for b in buckets]
        return {"buckets": out,
                "after_key": out[-1]["key"] if out else None}
    if kind == "global":
        # OpenSearch global agg: sub-aggs over the WHOLE live corpus,
        # ignoring the outer query and filters (text="" is the
        # match_all facet path)
        sub = spec.get("aggs", spec.get("aggregations"))
        if not sub:
            raise ValueError("global needs nested aggs")
        return {n: _run_agg(engine, n, s, "", None)
                for n, s in sub.items()}
    if kind == "missing":
        return {"doc_count": engine.facet_missing_count(
            text, fld, filters=filters)}
    if kind == "extended_stats":
        # exact int partials merge across shards; variance/std derive
        # once at the end (one fixed float expression)
        return engine.extended_stats_from_partials(
            engine.stats_partials(text, fld, filters=filters))
    if kind == "weighted_avg":
        vb, wb = body.get("value"), body.get("weight")
        if not (isinstance(vb, dict) and isinstance(wb, dict)):
            raise ValueError("weighted_avg needs value.field and "
                             "weight.field")
        p = engine.weighted_avg_partials(text, vb["field"],
                                         wb["field"], filters=filters)
        return {"value": (p["vw"] / p["w"]) if p["w"] else None}
    if kind == "multi_terms":
        terms = body.get("terms")
        if not isinstance(terms, list) or not terms:
            raise ValueError("multi_terms needs a 'terms' list of "
                             "{field} dicts")
        flds = [t["field"] for t in terms]
        rows = engine.facet_multi_terms(text, flds, filters=filters)
        sz = int(body.get("size", 10))
        return [{"key": list(tup), "doc_count": c}
                for tup, c in rows[:sz]]
    if kind == "sampler":
        # sub-aggs over the per-shard top shard_size BM25 matches
        # (the OpenSearch sampler contract); the sample is ≤
        # shard_size × shards rows by construction → pandas sub-aggs
        sub = spec.get("aggs", spec.get("aggregations"))
        if not sub:
            raise ValueError("sampler needs nested aggs")
        flds = set()
        for sspec in sub.values():
            (sk, sb), = sspec.items()
            if sk not in ("terms",) + _METRIC_SUBAGGS:
                raise ValueError("sampler sub-aggs support terms + "
                                 f"metric kinds, not {sk}")
            flds.add(sb["field"])
        sample = engine.top_docs_meta(
            text, sorted(flds),
            shard_size=int(body.get("shard_size", 100)),
            filters=filters)
        out = {"doc_count": int(len(sample))}
        for sname, sspec in sub.items():
            (sk, sb), = sspec.items()
            col = sample[sb["field"]]
            if sk == "terms":
                vc = col.value_counts()
                buckets = sorted(((v, int(c)) for v, c in vc.items()),
                                 key=lambda t: (-t[1], t[0]))
                sz = int(sb.get("size", 10))
                out[sname] = [{"key": v, "doc_count": c}
                              for v, c in buckets[:sz]]
            elif sk == "stats":
                out[sname] = {"count": int(col.count()),
                              "min": float(col.min()),
                              "max": float(col.max()),
                              "sum": float(col.sum()),
                              "avg": float(col.sum())
                              / int(col.count())}
            elif sk == "value_count":
                out[sname] = {"value": int(col.count())}
            else:
                v = getattr(col, {"min": "min", "max": "max",
                                  "avg": "mean",
                                  "sum": "sum"}[sk])()
                out[sname] = {"value": float(v)}
        return out
    if kind == "boxplot":
        # exact five-number summary on the percentiles machinery
        # (nearest-rank, == DuckDB quantile_disc; OpenSearch serves a
        # TDigest approximation)
        q = engine.facet_percentiles(text, fld,
                                     percents=[25, 50, 75],
                                     filters=filters)
        s = engine.facet_stats(text, fld, filters=filters)
        if not s or s.get("count", 0) == 0:
            return {"min": None, "q1": None, "q2": None,
                    "q3": None, "max": None}
        return {"min": float(s["min"]), "q1": q["25"], "q2": q["50"],
                "q3": q["75"], "max": float(s["max"])}
    if kind == "percentile_ranks":
        # exact inverse percentiles: 100·(count ≤ v)/n, one division
        # per probe (OpenSearch serves a TDigest approximation —
        # documented stronger semantics, same API)
        values = body.get("values")
        if not isinstance(values, list) or not values:
            raise ValueError("percentile_ranks needs a 'values' list")
        p = engine.percentile_rank_partials(text, fld, values,
                                            filters=filters)
        return {"values": {str(v): (100.0 * c / p["n"]
                                    if p["n"] else None)
                           for v, c in zip(values, p["le"])}}
    if kind == "rare_terms":
        # buckets with doc_count <= max_doc_count, ordered
        # (count asc, key asc) — the OpenSearch rare_terms contract
        # (served exactly here; OpenSearch approximates with a CuckooF)
        mx = int(body.get("max_doc_count", 1))
        rows = engine.facets(text, [fld], filters=filters)
        rare = [(v, c) for _, v, c in rows if c <= mx]
        rare.sort(key=lambda t: (t[1], t[0]))
        return [{"key": v, "doc_count": c} for v, c in rare]
    if kind == "date_range":
        # ISO-date ranges over an epoch-day column: [from, to) like
        # the range agg (OpenSearch date_range convention)
        def _day(s):
            return None if s is None else int(
                np.datetime64(str(s), "D").astype("int64"))
        rgs = [{"from": _day(rg.get("from")), "to": _day(rg.get("to"))}
               for rg in body["ranges"]]
        rows = engine.facet_ranges(text, fld, rgs, filters=filters)
        out = []
        for (lo, hi, c), rg in zip(rows, body["ranges"]):
            b = {"key": f"{rg.get('from', '*')}-{rg.get('to', '*')}",
                 "doc_count": c}
            if lo is not None:
                b["from"] = int(lo)
                b["from_as_string"] = str(rg["from"])
            if hi is not None:
                b["to"] = int(hi)
                b["to_as_string"] = str(rg["to"])
            out.append(b)
        return out
    if kind == "adjacency_matrix":
        # named filters + all pairwise intersections (OpenSearch
        # adjacency_matrix; key "a&b" with names sorted) — pure
        # composition over the filters-agg engine op
        named = body.get("filters")
        if not isinstance(named, dict) or not named:
            raise ValueError("adjacency_matrix needs a non-empty "
                             "'filters' dict")
        names = sorted(named)
        pairs = {f"{a}&{b}": {"bool": {"must": [named[a], named[b]]}}
                 for i, a in enumerate(names)
                 for b in names[i + 1:]}
        rows = engine.facet_filters(text, {**named, **pairs},
                                    filters=filters)
        return [{"key": n, "doc_count": c} for n, c in rows if c > 0]
    if kind == "range":
        rows = engine.facet_ranges(text, fld, list(body["ranges"]),
                                   filters=filters)
        return [{"key": f"{'*' if lo is None else lo}-"
                        f"{'*' if hi is None else hi}",
                 **({} if lo is None else {"from": lo}),
                 **({} if hi is None else {"to": hi}),
                 "doc_count": c}
                for lo, hi, c in rows]
    if kind == "stats":
        return engine.facet_stats(text, fld, filters=filters)
    if kind == "cardinality":
        # default is EXACT (documented stronger semantics than
        # OpenSearch); a precision_threshold opts into the HLL
        # register sketch (the OpenSearch behavior — ~1.6% rel. error
        # at p=12, linear-counting-corrected at small n, per-shard
        # registers merge bit-identically)
        if "precision_threshold" in body:
            return {"value": engine.facet_cardinality_approx(
                text, fld, filters=filters)}
        return {"value": engine.facet_cardinality(text, fld,
                                                  filters=filters)}
    # single-value metrics ride the stats op (one pass, same mask)
    s = engine.facet_stats(text, fld, filters=filters)
    return {"value": s["count"] if kind == "value_count" else s[kind]}


def _has_nested_bool(node: dict) -> bool:
    """True when any clause group of a bool node holds a bool child —
    the shape parse_query's flat plan cannot express (routed to
    engine.search_bool_tree instead)."""
    b = node["bool"]
    for g in ("must", "should", "must_not", "filter"):
        v = b.get(g) or []
        for c in (v if isinstance(v, list) else [v]):
            if _node_kind(c) == "bool":
                return True
    return False


def _filter_context(flt) -> tuple[str, dict | None]:
    """Decompose a filter-context node list (term / range / match /
    match_all) into (conjunctive query text, metadata filters) — the
    shared form for constant_score / function_score filters."""
    nodes = flt if isinstance(flt, list) else ([flt] if flt else [])
    cfilters: dict = {}
    texts: list[str] = []
    for fn in nodes:
        fk = _node_kind(fn)
        if fk in ("term", "terms", "range", "exists"):
            col, val = _filter_entry(fk, fn[fk])
            cfilters[col] = val
        elif fk == "match":
            texts.append(_text_arg(fn[fk])["query"])
        elif fk != "match_all":
            raise ValueError(
                "filter context supports term/terms/range/exists/"
                "match/match_all nodes")
    return " ".join(texts), cfilters or None


def execute_dsl(engine, body: dict, max_k: int | None = None):
    """Execute an OpenSearch-style body on ``engine`` (a QueryEngine or
    ShardedEngine). Returns the routed op's native result rows."""
    if not isinstance(body, dict) or "query" not in body:
        raise ValueError("body needs a 'query' node")
    k = int(body.get("size", 10))
    if max_k is not None:
        k = min(k, max_k)
    min_score = body.get("min_score")
    node = body["query"]

    if _node_kind(node) == "script_score":
        # OpenSearch script_score: arithmetic over params._score +
        # kept metadata columns, evaluated vectorized engine-side
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations", "rescore")):
            raise ValueError("script_score composes with "
                             "size/min_score only")
        v = node["script_score"]
        sc = v.get("script")
        src = sc.get("source") if isinstance(sc, dict) else sc
        if not isinstance(src, str) or "query" not in v:
            raise ValueError("script_score needs 'query' and "
                             "'script' (string or {source})")
        return engine.search_script_score(v["query"], src, k=k,
                                          min_score=min_score)

    if _node_kind(node) == "ids":
        # OpenSearch ids query — constant-score hits for the present,
        # live subset of the given doc_ids, doc_id ascending
        v = node["ids"]
        vals = v.get("values") if isinstance(v, dict) else v
        if not isinstance(vals, list):
            raise ValueError("ids needs a 'values' list")
        boost = float(v.get("boost", 1.0)) if isinstance(v, dict) \
            else 1.0
        return [(int(d), boost) for d in engine.match_ids(vals)[:k]]

    if _node_kind(node) in ("span_near", "span_first", "span_not"):
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations", "rescore")):
            raise ValueError("span queries compose with size/min_score "
                             "only")
        kind = _node_kind(node)
        v = node[kind]
        if kind == "span_near":
            terms = [_span_term(c) for c in v.get("clauses", [])]
            if not terms:
                raise ValueError("span_near needs a non-empty "
                                 "'clauses' list")
            return engine.search_span_near(
                terms, k=k, slop=int(v.get("slop", 0)),
                in_order=bool(v.get("in_order", True)),
                min_score=min_score)
        # span_first / span_not are position PREDICATES — served as
        # constant-score hits (boost per hit), doc_id ascending
        boost = float(v.get("boost", 1.0))
        if kind == "span_first":
            docs = engine.match_span_first_docs(
                _span_term(v.get("match")), int(v["end"]))
        else:
            docs = engine.match_span_not_docs(
                _span_term(v.get("include")),
                _span_term(v.get("exclude")),
                dist=int(v.get("dist", 0)))
        return [(int(d), boost) for d in docs[:k]]

    if (_node_kind(node) == "match"
            and isinstance(node["match"], dict)
            and "synonyms" in node["match"]):
        # query-time synonym expansion (what OpenSearch's
        # synonym_graph search analyzer produces): each query token
        # becomes a Lucene SynonymQuery group — blended df/tf, one
        # BM25 term per group; "operator": "and" requires every group
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations", "rescore")):
            raise ValueError("synonym match composes with "
                             "size/min_score only")
        from baram_ray.tokenizer import analyze_phrase
        d = node["match"]
        syn = d["synonyms"] or {}
        groups = [[t] + list(syn.get(t, []))
                  for t in analyze_phrase(d["query"])]
        return engine.search_synonym(
            groups, k=k, operator=d.get("operator", "or"),
            min_score=min_score)

    if _node_kind(node) == "query_string":
        qs = _text_arg(node["query_string"])["query"]
        if any(key in body for key in ("sort", "collapse",
                                       "search_after")):
            raise ValueError("query_string composes with size/min_score "
                             "only — use an explicit query node for "
                             "sort/collapse/search_after")
        return engine.search_qs(qs, k=k, min_score=min_score)

    if _node_kind(node) == "multi_match":
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("multi_match composes with size/min_score "
                             "only")
        mm = node["multi_match"]
        fields, boosts = _parse_field_boosts(mm.get("fields"))
        mtype = mm.get("type", "most_fields")
        if mtype == "most_fields":
            # per-field scores SUM (this engine's native multi-field
            # accumulation)
            return engine.search(mm["query"], k=k, fields=fields,
                                 boosts=boosts, min_score=min_score)
        if mtype == "best_fields":
            # Lucene's default: dis_max over single-field match
            # clauses; ^boosts become clause boosts, tie_breaker
            # blends the non-best fields
            specs = []
            for f in fields:
                spec = {"match": mm["query"], "fields": [f]}
                if boosts and boosts.get(f, 1.0) != 1.0:
                    spec["boost"] = float(boosts[f])
                specs.append(spec)
            return engine.search_dismax(
                specs, tie_breaker=float(mm.get("tie_breaker", 0.0)),
                k=k, min_score=min_score)
        raise ValueError("multi_match type must be most_fields or "
                         "best_fields")

    if "rescore" in body:
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("rescore composes with size/min_score "
                             "only")
        if _node_kind(node) != "match":
            raise ValueError("rescore needs a match primary query "
                             "(the BM25 window source)")
        rs = body["rescore"]
        rq = rs.get("query") or {}
        if "rescore_query" not in rq:
            raise ValueError("rescore.query.rescore_query is "
                             "required")
        rows = engine.search_rescore(
            _text_arg(node["match"])["query"], rq["rescore_query"],
            k=k, window_size=int(rs.get("window_size", 50)),
            query_weight=float(rq.get("query_weight", 1.0)),
            rescore_query_weight=float(
                rq.get("rescore_query_weight", 1.0)))
        if min_score is not None:      # applies to the COMBINED score
            rows = [(d, s) for d, s in rows if s >= min_score]
        return rows

    if _node_kind(node) == "boosting":
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("boosting composes with size/min_score "
                             "only")
        bq = node["boosting"]
        if "positive" not in bq or "negative" not in bq:
            raise ValueError("boosting needs positive and negative "
                             "query nodes")
        rows = engine.search_boosting(
            bq["positive"], bq["negative"],
            negative_boost=float(bq.get("negative_boost", 0.5)), k=k)
        if min_score is not None:
            rows = [(d, s) for d, s in rows if s >= min_score]
        return rows

    if _node_kind(node) == "dis_max":
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("dis_max composes with size/min_score "
                             "only")
        dm = node["dis_max"]
        subs = dm.get("queries")
        if not subs or not isinstance(subs, list):
            raise ValueError("dis_max needs a non-empty 'queries' "
                             "list")
        specs = []
        for sn in subs:
            sk = _node_kind(sn)
            specs.append(_leaf_spec(sk, sn[sk]))
        return engine.search_dismax(
            specs, tie_breaker=float(dm.get("tie_breaker", 0.0)),
            k=k, min_score=min_score)

    if _node_kind(node) == "constant_score":
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("constant_score composes with size only")
        cs = node["constant_score"]
        qtext, cfilters = _filter_context(cs.get("filter"))
        return engine.search_constant_score(
            boost=float(cs.get("boost", 1.0)), k=k,
            query=qtext, filters=cfilters)

    if _node_kind(node) == "function_score":
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("function_score composes with size/"
                             "min_score only")
        fs = node["function_score"]
        fvf = fs.get("field_value_factor")
        if not fvf:
            raise ValueError("function_score needs a "
                             "field_value_factor function")
        boost_mode = fs.get("boost_mode", "multiply")
        inner = fs.get("query", {"match_all": {}})
        ik = _node_kind(inner)
        if boost_mode == "multiply":
            if ik != "match":
                raise ValueError("boost_mode=multiply needs a match "
                                 "query (BM25 base)")
            qtext, ffilters = _text_arg(inner["match"])["query"], None
        elif ik == "bool":
            bl = inner["bool"].get("filter")
            qtext, ffilters = _filter_context(bl)
        else:
            qtext, ffilters = _filter_context(
                [] if ik == "match_all" else [inner])
        rows = engine.search_function_score(
            qtext, k=k, field=fvf["field"],
            factor=float(fvf.get("factor", 1.0)),
            modifier=fvf.get("modifier", "none"),
            boost_mode=boost_mode, filters=ffilters)
        if min_score is not None:
            rows = [(d, s) for d, s in rows if s >= min_score]
        return rows

    if _node_kind(node) == "bool" and _has_nested_bool(node):
        if any(key in body for key in ("sort", "collapse",
                                       "search_after", "aggs",
                                       "aggregations")):
            raise ValueError("nested bool composes with size/"
                             "min_score only")
        return engine.search_bool_tree(
            node, k=k, min_score=body.get("min_score"))

    plan = parse_query(node)
    filters = plan.filters or None

    # ---- aggregations ride a conjunctive match (or match_all) ------ #
    aggs = body.get("aggs", body.get("aggregations"))
    if aggs is not None:
        if any(key in body for key in ("sort", "collapse",
                                       "search_after")):
            raise ValueError("aggs compose with a plain query only")
        scoring = plan.must + plan.should
        if not plan.specs:
            text = ""                      # match_all: whole live corpus
        elif (len(scoring) == 1 and not plan.must_not
                and "match" in scoring[0]
                and "boost" not in scoring[0]):
            # one match clause (must or should) + any metadata
            # filters: the conjunctive match set the facet paths take
            text = scoring[0]["match"]
        else:
            raise ValueError(
                "aggs need a match/match_all query — the engine's "
                "facet paths aggregate over a conjunctive match set")
        out_aggs: dict = {}
        siblings = {n: s for n, s in aggs.items()
                    if any(k in s for k in _SIBLING_AGGS)}
        for name, spec in aggs.items():
            if name in siblings:
                continue
            out_aggs[name] = _run_agg(engine, name, spec, text, filters)
        for name, spec in siblings.items():
            (skind, sbody), = spec.items()
            out_aggs[name] = _run_sibling_agg(skind, sbody, out_aggs)
        hits = (engine.search(text, k=k, filters=filters,
                              min_score=min_score)
                if k > 0 and text else [])
        return {"hits": hits, "aggregations": out_aggs}

    # ---- sort / collapse / search_after need a plain match text ---- #
    sort = body.get("sort")
    collapse = body.get("collapse")
    after = body.get("search_after")
    if sort is not None or collapse is not None or after is not None:
        if (len(plan.should) == 1 and not plan.must
                and not plan.must_not
                and "match" in plan.should[0]
                and "boost" not in plan.should[0]):
            text = plan.should[0]["match"]
        else:
            raise ValueError(
                "sort/collapse/search_after need exactly one match "
                "clause — the engine's sorted/collapsed/after paths "
                "are match-query ops")
        if sort is not None:
            col, ascending = _sort_key(sort)
            if collapse is not None:
                if after is not None:
                    raise ValueError("search_after does not compose "
                                     "with collapse")
                return engine.search_collapse_sorted(
                    text, collapse["field"], col, k=k,
                    ascending=ascending, filters=filters)
            cursor = ((after[0], int(after[1]))
                      if after is not None else None)
            return engine.search_sorted(text, col, k=k,
                                        ascending=ascending,
                                        filters=filters, after=cursor)
        if collapse is not None:
            return engine.search_collapse(text, collapse["field"], k=k,
                                          filters=filters)
        return engine.search(text, k=k, filters=filters,
                             min_score=min_score,
                             after=(float(after[0]), int(after[1])))

    # ---- single dedicated op (bit-identical to the explicit call) -- #
    if (len(plan.specs) == 1 and plan.should and
            plan.minimum_should_match is None and
            "boost" not in plan.should[0]):
        spec = plan.should[0]
        if "match" in spec:
            return engine.search(spec["match"], k=k, filters=filters,
                                 min_score=min_score)
        if "phrase" in spec:
            return engine.search_phrase(
                spec["phrase"], k=k, slop=spec.get("slop", 0),
                fields=spec.get("fields"), filters=filters,
                min_score=min_score)
        if "phrase_prefix" in spec:
            return engine.search_phrase_prefix(
                spec["phrase_prefix"], k=k,
                max_expansions=spec["max_expansions"],
                fields=spec.get("fields"), filters=filters,
                min_score=min_score)
        if "prefix" in spec:
            return engine.search_prefix(
                spec["prefix"], k=k,
                max_expansions=spec["max_expansions"],
                filters=filters, min_score=min_score)
        if "wildcard" in spec:
            return engine.search_wildcard(
                spec["wildcard"], k=k,
                max_expansions=spec["max_expansions"],
                filters=filters, min_score=min_score)
        if "regexp" in spec:
            return engine.search_regexp(
                spec["regexp"], k=k,
                max_expansions=spec["max_expansions"],
                filters=filters, min_score=min_score)
        return engine.search_fuzzy(
            spec["fuzzy"], k=k, max_edits=spec["max_edits"],
            prefix_length=spec["prefix_length"],
            max_expansions=spec["max_expansions"],
            filters=filters, min_score=min_score)

    if not plan.specs:
        raise ValueError("filter-only query has no ranking — use "
                         "facets() or search_sorted()")

    # ---- general bool: match-only → search_bool, else compound ----- #
    if all("match" in s and "boost" not in s for s in plan.specs):
        return engine.search_bool(
            must=[s["match"] for s in plan.must] or None,
            should=[s["match"] for s in plan.should] or None,
            must_not=[s["match"] for s in plan.must_not] or None,
            minimum_should_match=plan.minimum_should_match,
            k=k, filters=filters, min_score=min_score)
    return engine.search_compound(
        must=plan.must or None, should=plan.should or None,
        must_not=plan.must_not or None,
        minimum_should_match=plan.minimum_should_match,
        k=k, filters=filters, min_score=min_score)


def _sort_key(sort) -> tuple[str, bool]:
    """OpenSearch sort spec → (column, ascending). Accepts "col",
    [{"col": {"order": "desc"}}], [{"col": "desc"}]."""
    if isinstance(sort, list):
        if len(sort) != 1:
            raise ValueError("exactly one sort key is supported")
        sort = sort[0]
    if isinstance(sort, str):
        return sort, True
    if isinstance(sort, dict) and len(sort) == 1:
        col, v = next(iter(sort.items()))
        order = v.get("order", "asc") if isinstance(v, dict) else str(v)
        if order not in ("asc", "desc"):
            raise ValueError(f"bad sort order {order!r}")
        return col, order == "asc"
    raise ValueError(f"bad sort spec {sort!r}")
