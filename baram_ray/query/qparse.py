"""Query-string parser — the `q=` surface of the reference's REST API
(`src/commands/serve.rs:274-426`: a raw string becomes a bool-should
multi-field match), extended with the OpenSearch ``simple_query_string``
conveniences its backend accepts:

- bare terms                → should clauses (default OR, like the
                              reference's ``minimum_should_match: 1``)
- ``+term`` / ``term AND``  → must clause
- ``-term`` / ``NOT term``  → must_not clause
- ``"a phrase"`` (``~N``)   → exact phrase (optional slop)
- ``pre*`` / ``wi?ld*``     → prefix / wildcard expansion
- ``term~`` / ``term~2``    → fuzzy (edit distance, default 1)
- ``col:value``             → metadata equality filter on a KEPT
                              column (``col:lo..hi`` = range)

The parser produces a small plan and ROUTES it to the matching exact
engine operation (``search`` / ``search_bool`` / ``search_phrase`` /
``search_prefix`` / ``search_wildcard`` / ``search_fuzzy`` — each
independently rank-tested), so parsed execution is bit-identical to
the explicit API call. Mixing structurally different clause kinds in
one string (a phrase plus loose terms, two wildcards, …) raises
``UnsupportedQuery`` with the explicit-API spelling in the message —
an honest boundary instead of silently-wrong scoring.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


class UnsupportedQuery(ValueError):
    """Query-string shape with no single exact engine op."""


_TOKEN_RE = re.compile(
    r'"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?'   # "quoted phrase"~N
    r"|(?P<word>\S+)")

_FIELD_RE = re.compile(r"^(?P<col>[A-Za-z_][A-Za-z0-9_]*):(?P<val>.+)$")


@dataclass
class Plan:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrase: str | None = None
    slop: int = 0
    prefix: str | None = None
    wildcard: str | None = None
    fuzzy: str | None = None
    fuzzy_edits: int = 1
    filters: dict = field(default_factory=dict)


def _range_or_scalar(val: str):
    """``lo..hi`` → range dict (either side open), else equality.
    Numeric-looking bounds are coerced so kept NUMERIC columns (e.g.
    n_chars) compare correctly."""
    def coerce(s: str):
        try:
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return s

    if ".." in val:
        lo, _, hi = val.partition("..")
        rng = {}
        if lo:
            rng["gte"] = coerce(lo)
        if hi:
            rng["lte"] = coerce(hi)
        if rng:
            return rng
    return coerce(val)


def parse(q: str) -> Plan:
    """Parse a query string into a routing plan (no engine access —
    unknown filter columns surface at execution, like the explicit
    API)."""
    plan = Plan()
    pending_not = False
    pending_and = False
    tokens = list(_TOKEN_RE.finditer(q or ""))
    for i, mo in enumerate(tokens):
        if mo.group("phrase") is not None:
            if plan.phrase is not None:
                raise UnsupportedQuery(
                    "multiple phrases — call search_phrase per phrase")
            plan.phrase = mo.group("phrase")
            plan.slop = int(mo.group("slop") or 0)
            if pending_not:
                raise UnsupportedQuery(
                    'NOT "phrase" — use search_bool + search_phrase')
            pending_not = pending_and = False
            continue
        w = mo.group("word")
        up = w.upper()
        if up in ("AND", "&&"):
            # retroactively promote the previous should term
            if plan.should:
                plan.must.append(plan.should.pop())
            pending_and = True
            continue
        if up in ("OR", "||"):
            pending_and = False
            continue
        if up == "NOT":
            pending_not = True
            continue
        neg = pending_not or w.startswith("-")
        must = pending_and or w.startswith("+")
        pending_not = pending_and = False
        w = w.lstrip("+-")
        if not w:
            continue
        fm = _FIELD_RE.match(w)
        if fm and not neg and not must and "*" not in w and "?" not in w:
            plan.filters[fm.group("col")] = _range_or_scalar(
                fm.group("val"))
            continue
        tilde = re.match(r"^(?P<base>[^~]+)~(?P<n>\d*)$", w)
        if tilde:
            if plan.fuzzy is not None:
                raise UnsupportedQuery(
                    "multiple fuzzy terms — call search_fuzzy per term")
            plan.fuzzy = tilde.group("base")
            plan.fuzzy_edits = int(tilde.group("n") or 1)
            continue
        if "*" in w or "?" in w:
            if plan.wildcard or plan.prefix:
                raise UnsupportedQuery(
                    "multiple wildcard terms — call search_wildcard "
                    "per pattern")
            if re.match(r"^[^*?]+\*$", w):
                plan.prefix = w[:-1]
            else:
                plan.wildcard = w
            continue
        (plan.must_not if neg else plan.must if must
         else plan.should).append(w)
    return plan


def execute(engine, q: str, k: int = 10, **kw):
    """Parse ``q`` and route to the ONE exact engine op it denotes.
    ``kw`` (boosts, min_score, …) pass through; string-level filters
    merge over ``kw['filters']``. Returns the op's (doc_id, score)
    list."""
    plan = parse(q)
    filters = {**(kw.pop("filters", None) or {}), **plan.filters}
    filters = filters or None
    special = [s for s in
               ("phrase" if plan.phrase is not None else None,
                "prefix" if plan.prefix is not None else None,
                "wildcard" if plan.wildcard is not None else None,
                "fuzzy" if plan.fuzzy is not None else None) if s]
    has_terms = bool(plan.must or plan.should or plan.must_not)
    if len(special) > 1 or (special and has_terms):
        raise UnsupportedQuery(
            f"cannot combine {special + (['terms'] if has_terms else [])}"
            " in one string — compose the explicit API calls")
    if plan.phrase is not None:
        return engine.search_phrase(plan.phrase, k=k, slop=plan.slop,
                                    filters=filters, **kw)
    if plan.prefix is not None:
        return engine.search_prefix(plan.prefix, k=k, filters=filters,
                                    **kw)
    if plan.wildcard is not None:
        return engine.search_wildcard(plan.wildcard, k=k,
                                      filters=filters, **kw)
    if plan.fuzzy is not None:
        return engine.search_fuzzy(plan.fuzzy, k=k,
                                   max_edits=plan.fuzzy_edits,
                                   filters=filters, **kw)
    if plan.must or plan.must_not:
        return engine.search_bool(must=plan.must or None,
                                  should=plan.should or None,
                                  must_not=plan.must_not or None,
                                  k=k, filters=filters, **kw)
    if plan.should:
        return engine.search(" ".join(plan.should), k=k,
                             filters=filters, **kw)
    if filters:
        raise UnsupportedQuery(
            "filters-only string has no ranking — use facets() or "
            "search_sorted() for metadata-only retrieval")
    return []
