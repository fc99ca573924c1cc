"""Query-string parser — the `q=` surface of the reference's REST API
(`src/commands/serve.rs:274-426`: a raw string becomes a bool-should
multi-field match), extended with the OpenSearch ``simple_query_string``
conveniences its backend accepts:

- bare terms                → should clauses (default OR, like the
                              reference's ``minimum_should_match: 1``)
- ``+term`` / ``term AND``  → must clause
- ``-term`` / ``NOT term``  → must_not clause
- ``"a phrase"`` (``~N``)   → exact phrase (optional slop); ``+``/``-``
                              and AND/NOT apply like on terms
- ``pre*`` / ``wi?ld*``     → prefix / wildcard expansion
- ``/rege.xp/``             → regexp expansion (anchored, Lucene
                              query-string regexp syntax)
- ``term~`` / ``term~2``    → fuzzy (edit distance, default 1)
- ``col:value``             → metadata equality filter on a KEPT
                              column (``col:lo..hi`` = range)

The parser produces a small plan and ROUTES it to the matching exact
engine operation. A string that denotes ONE dedicated op (``search`` /
``search_bool`` / ``search_phrase`` / ``search_prefix`` /
``search_wildcard`` / ``search_fuzzy`` — each independently
rank-tested) executes bit-identically to the explicit API call; a
string that MIXES clause kinds (a phrase plus loose terms, two
wildcards, a negated phrase, …) routes to ``search_compound``, whose
per-clause scoring is score-identical to the dedicated ops (tested),
so mixing composes instead of raising. ``UnsupportedQuery`` remains
only for shapes with no ranking at all (filters-only strings) and for
shard-unsafe expansion kinds on the sharded engine.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


class UnsupportedQuery(ValueError):
    """Query-string shape with no single exact engine op."""


_TOKEN_RE = re.compile(
    r'(?P<sign>[-+])?"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?'  # ±"a b"~N
    r"|(?P<word>\S+)")

_FIELD_RE = re.compile(r"^(?P<col>[A-Za-z_][A-Za-z0-9_]*):(?P<val>.+)$")


@dataclass
class Plan:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    # typed non-match clauses: (polarity, spec) with polarity in
    # {"must", "should", "must_not"} and spec a search_compound clause
    # dict ({"phrase": ...}, {"prefix": ...}, ...)
    specials: list[tuple[str, dict]] = field(default_factory=list)
    filters: dict = field(default_factory=dict)

    # -- legacy single-special accessors (the round-3 Plan surface) --- #
    def _one(self, kind: str) -> dict | None:
        specs = [s for _, s in self.specials if kind in s]
        return specs[0] if len(specs) == 1 else None

    @property
    def phrase(self) -> str | None:
        s = self._one("phrase")
        return s["phrase"] if s else None

    @property
    def slop(self) -> int:
        s = self._one("phrase")
        return int(s.get("slop", 0)) if s else 0

    @property
    def prefix(self) -> str | None:
        s = self._one("prefix")
        return s["prefix"] if s else None

    @property
    def wildcard(self) -> str | None:
        s = self._one("wildcard")
        return s["wildcard"] if s else None

    @property
    def fuzzy(self) -> str | None:
        s = self._one("fuzzy")
        return s["fuzzy"] if s else None

    @property
    def fuzzy_edits(self) -> int:
        s = self._one("fuzzy")
        return int(s.get("max_edits", 1)) if s else 1


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
    for mo in _TOKEN_RE.finditer(q or ""):
        if mo.group("phrase") is not None:
            sign = mo.group("sign") or ""
            neg = pending_not or sign == "-"
            must = pending_and or sign == "+"
            pending_not = pending_and = False
            pol = "must_not" if neg else "must" if must else "should"
            plan.specials.append(
                (pol, {"phrase": mo.group("phrase"),
                       "slop": int(mo.group("slop") or 0)}))
            continue
        w = mo.group("word")
        up = w.upper()
        if up in ("AND", "&&"):
            # retroactively promote the previous positive clause
            if plan.should:
                plan.must.append(plan.should.pop())
            elif plan.specials and plan.specials[-1][0] == "should":
                pol, spec = plan.specials.pop()
                plan.specials.append(("must", spec))
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
        pol = "must_not" if neg else "must" if must else "should"
        fm = _FIELD_RE.match(w)
        if fm and not neg and not must and "*" not in w and "?" not in w:
            plan.filters[fm.group("col")] = _range_or_scalar(
                fm.group("val"))
            continue
        if len(w) > 2 and w.startswith("/") and w.endswith("/"):
            plan.specials.append((pol, {"regexp": w[1:-1]}))
            continue
        tilde = re.match(r"^(?P<base>[^~]+)~(?P<n>\d*)$", w)
        if tilde:
            plan.specials.append(
                (pol, {"fuzzy": tilde.group("base"),
                       "max_edits": int(tilde.group("n") or 1)}))
            continue
        if "*" in w or "?" in w:
            if re.match(r"^[^*?]+\*$", w):
                plan.specials.append((pol, {"prefix": w[:-1]}))
            else:
                plan.specials.append((pol, {"wildcard": w}))
            continue
        (plan.must_not if neg else plan.must if must
         else plan.should).append(w)
    return plan


def _compound_clauses(plan: Plan) -> dict[str, list]:
    """Plan → search_compound clause lists (match terms ride as bare
    strings; specials carry their typed spec)."""
    groups: dict[str, list] = {"must": list(plan.must),
                               "should": list(plan.should),
                               "must_not": list(plan.must_not)}
    for pol, spec in plan.specials:
        groups[pol].append(spec)
    return groups


def execute(engine, q: str, k: int = 10, **kw):
    """Parse ``q`` and route: a single-kind string goes to its dedicated
    exact engine op (bit-identical to the explicit call); a mixed-kind
    string goes to ``search_compound`` (per-clause scoring identical to
    the dedicated ops). ``kw`` (boosts, min_score, …) pass through;
    string-level filters merge over ``kw['filters']``. Returns the
    op's (doc_id, score) list."""
    plan = parse(q)
    filters = {**(kw.pop("filters", None) or {}), **plan.filters}
    filters = filters or None
    has_terms = bool(plan.must or plan.should or plan.must_not)
    if plan.specials:
        if len(plan.specials) == 1 and not has_terms:
            pol, spec = plan.specials[0]
            if pol == "must_not":        # no positive clause → no hits
                return []
            if "phrase" in spec:
                return engine.search_phrase(
                    spec["phrase"], k=k, slop=int(spec.get("slop", 0)),
                    filters=filters, **kw)
            if "prefix" in spec:
                return engine.search_prefix(spec["prefix"], k=k,
                                            filters=filters, **kw)
            if "regexp" in spec:
                return engine.search_regexp(spec["regexp"], k=k,
                                            filters=filters, **kw)
            if "wildcard" in spec:
                return engine.search_wildcard(spec["wildcard"], k=k,
                                              filters=filters, **kw)
            return engine.search_fuzzy(spec["fuzzy"], k=k,
                                       max_edits=spec.get("max_edits", 1),
                                       filters=filters, **kw)
        g = _compound_clauses(plan)
        return engine.search_compound(must=g["must"] or None,
                                      should=g["should"] or None,
                                      must_not=g["must_not"] or None,
                                      k=k, filters=filters, **kw)
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
