"""Brute-force BM25 oracle — the in-repo "reference engine".

Pure-Python, O(docs × query terms), no Ray: tokenize → df/dl/avgdl → score
EVERY doc → sort ``(score desc, doc_id asc)`` → top-k. The Ray engine
(exhaustive DAAT and block-max WAND alike) must be rank-identical to this
on the reference query set (FIXTURES.md §2, SURVEY.md §5).

Scoring (identical constants + accumulation order in both engines):

- Lucene/OpenSearch BM25, the similarity the reference index uses by
  default (no ``similarity`` override in ``src/embedding/mod.rs:238-277``):
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
  ``score += boost_f * idf * tf / (tf + k1*(1 - b + b*dl_f/avgdl_f))``.
- k1=1.2, b=0.75.
- Multi-field bool-should with per-field boost: sum over fields of the
  field's BM25 — the reference's title^2.0/content shape
  (``src/embedding/mod.rs:470-507``); for code we boost ``path`` 2.0.
- Unique query terms score once each; accumulation is float64 in
  (field order, sorted-term order) — fixed so fp summation is reproducible.
- ``minimum_should_match: 1`` → any doc matching ≥1 (field, term) is a hit.
- Tie-break ``doc_id`` ascending (Lucene's internal-docid order).
"""

from __future__ import annotations

import math
from collections import Counter

from baram_ray.tokenizer import (
    analyze_phrase, term_counts, tokenize, tokenize_with_positions,
)


class OracleIndex:
    """In-memory brute-force index over a list of doc dicts."""

    def __init__(self, docs: list[dict], fields: list[str],
                 k1: float = 1.2, b: float = 0.75,
                 meta_cols: list[str] | None = None):
        self.fields = fields
        self.k1, self.b = k1, b
        self.doc_ids = [int(d["doc_id"]) for d in docs]
        self._docs = docs                 # phrase clauses re-scan text
        self.meta = {c: [d.get(c) for d in docs] for c in (meta_cols or [])}
        self.tf: dict[str, list[Counter]] = {}
        self.dl: dict[str, list[int]] = {}
        self.df: dict[str, Counter] = {}
        self.avgdl: dict[str, float] = {}
        n = max(1, len(docs))
        for f in fields:
            tfs = [term_counts(d.get(f) or "") for d in docs]
            self.tf[f] = tfs
            self.dl[f] = [sum(c.values()) for c in tfs]
            dfc: Counter = Counter()
            for c in tfs:
                dfc.update(c.keys())
            self.df[f] = dfc
            self.avgdl[f] = sum(self.dl[f]) / n
        self.n_docs = len(docs)

    def search(self, query: str, k: int = 10,
               boosts: dict[str, float] | None = None,
               filters: dict[str, str] | None = None,
               min_score: float | None = None,
               fields: list[str] | None = None) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(query)))
        boosts = boosts or {}
        scores: dict[int, float] = {}
        use = (self.fields if fields is None
               else [f for f in self.fields if f in set(fields)])
        for f in use:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            for t in terms:
                df = self.df[f].get(t, 0)
                if df == 0:
                    continue
                idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                for i in range(self.n_docs):
                    tf = self.tf[f][i].get(t)
                    if not tf:
                        continue
                    dl = self.dl[f][i]
                    s = w * idf * tf / (tf + self.k1 * (1 - self.b + self.b * dl / avg))
                    di = self.doc_ids[i]
                    scores[di] = scores.get(di, 0.0) + s
        if filters:
            allowed = set()
            for i, di in enumerate(self.doc_ids):
                if all(self.meta[c][i] == v for c, v in filters.items()):
                    allowed.add(di)
            scores = {d: s for d, s in scores.items() if d in allowed}
        if min_score is not None:
            scores = {d: s for d, s in scores.items() if s >= min_score}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # ----------------------------------------------------------------- #
    def search_bool(self, must=None, should=None, must_not=None,
                    minimum_should_match=None, k: int = 10,
                    boosts=None) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_bool: each clause
        is a match query; all must match, none of must_not, ≥ msm of
        should; score = Σ BM25 of matching must+should clauses."""
        must, should, must_not = must or [], should or [], must_not or []
        if minimum_should_match is None:
            minimum_should_match = 1 if (should and not must) else 0
        if not must and not should:
            return []

        def clause(c: str) -> dict[int, float]:
            return dict(self.search(c, k=self.n_docs, boosts=boosts))

        musts = [clause(c) for c in must]
        shoulds = [clause(c) for c in should]
        nots = [clause(c) for c in must_not]
        cands = set(self.doc_ids)
        for m in musts:
            cands &= set(m)
        if shoulds:
            cands = {d for d in cands
                     if sum(d in s for s in shoulds) >= minimum_should_match}
        for m in nots:
            cands -= set(m)
        cands = {d for d in cands if any(d in m for m in musts + shoulds)}
        scores = {d: sum(m.get(d, 0.0) for m in musts + shoulds)
                  for d in cands}
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def search_compound(self, must=None, should=None, must_not=None,
                        minimum_should_match=None, k: int = 10,
                        boosts=None) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_compound: each
        typed clause's doc→score map comes from this oracle's OWN
        standalone op at k=n_docs; bool combination is identical to
        ``search_bool``."""
        must, should, must_not = must or [], should or [], must_not or []
        if minimum_should_match is None:
            minimum_should_match = 1 if (should and not must) else 0
        if not must and not should:
            return []

        def clause(spec) -> dict[int, float]:
            if isinstance(spec, str):
                spec = {"match": spec}
            cb = float(spec.get("boost", 1.0))
            if cb != 1.0:
                inner = clause({k: v for k, v in spec.items()
                                if k != "boost"})
                return {d: s * cb for d, s in inner.items()}
            if "match" in spec:
                return dict(self.search(spec["match"], k=self.n_docs,
                                        boosts=boosts))
            if "phrase" in spec:
                return dict(self.search_phrase(
                    self._docs, spec["phrase"], k=self.n_docs,
                    boosts=boosts, slop=int(spec.get("slop", 0))))
            if "phrase_prefix" in spec:
                return dict(self.search_phrase_prefix(
                    self._docs, spec["phrase_prefix"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "prefix" in spec:
                return dict(self.search_prefix(
                    spec["prefix"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "wildcard" in spec:
                return dict(self.search_wildcard(
                    spec["wildcard"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "regexp" in spec:
                return dict(self.search_regexp(
                    spec["regexp"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "fuzzy" in spec:
                return dict(self.search_fuzzy(
                    spec["fuzzy"], k=self.n_docs,
                    max_edits=spec.get("max_edits"),
                    prefix_length=int(spec.get("prefix_length", 0)),
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            raise ValueError(f"unknown clause spec {spec!r}")

        musts = [clause(c) for c in must]
        shoulds = [clause(c) for c in should]
        nots = [clause(c) for c in must_not]
        cands = set(self.doc_ids)
        for m in musts:
            cands &= set(m)
        if shoulds:
            cands = {d for d in cands
                     if sum(d in s for s in shoulds)
                     >= minimum_should_match}
        for m in nots:
            cands -= set(m)
        cands = {d for d in cands if any(d in m for m in musts + shoulds)}
        scores = {d: sum(m.get(d, 0.0) for m in musts + shoulds)
                  for d in cands}
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def search_prefix(self, prefix: str, k: int = 10,
                      max_expansions: int = 50,
                      boosts=None) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_prefix: expand to
        the first max_expansions terms per field in lexicographic order,
        score as bool-should of the expanded terms."""
        pre_toks = tokenize(prefix)
        if not pre_toks:
            return []
        pre = pre_toks[0]
        boosts = boosts or {}
        scores: dict[int, float] = {}
        for f in self.fields:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            terms = [t for t in sorted(self.df[f])
                     if t.startswith(pre)][:max_expansions]
            for t in terms:
                df = self.df[f][t]
                idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                for i in range(self.n_docs):
                    tf = self.tf[f][i].get(t)
                    if not tf:
                        continue
                    dl = self.dl[f][i]
                    s = w * idf * tf / (
                        tf + self.k1 * (1 - self.b + self.b * dl / avg))
                    di = self.doc_ids[i]
                    scores[di] = scores.get(di, 0.0) + s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def search_wildcard(self, pattern: str, k: int = 10,
                        max_expansions: int = 50,
                        boosts=None) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_wildcard: expand
        the (lowercased, unanalyzed) glob pattern against each field's
        sorted vocabulary, cap per field, score as bool-should."""
        import fnmatch
        import re as _re
        pat = pattern.strip().lower()
        if not pat:
            return []
        rx = _re.compile(fnmatch.translate(pat))
        boosts = boosts or {}
        scores: dict[int, float] = {}
        for f in self.fields:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            terms = [t for t in sorted(self.df[f])
                     if rx.match(t)][:max_expansions]
            for t in terms:
                df = self.df[f][t]
                idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                for i in range(self.n_docs):
                    tf = self.tf[f][i].get(t)
                    if not tf:
                        continue
                    dl = self.dl[f][i]
                    s = w * idf * tf / (
                        tf + self.k1 * (1 - self.b + self.b * dl / avg))
                    di = self.doc_ids[i]
                    scores[di] = scores.get(di, 0.0) + s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def search_regexp(self, pattern: str, k: int = 10,
                      max_expansions: int = 50,
                      boosts=None) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_regexp: expand
        the (lowercased, anchored) regexp against each field's sorted
        vocabulary, cap per field, score as bool-should."""
        import re as _re
        pat = pattern.strip().lower()
        if not pat:
            return []
        rx = _re.compile(pat)
        boosts = boosts or {}
        scores: dict[int, float] = {}
        for f in self.fields:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            terms = [t for t in sorted(self.df[f])
                     if rx.fullmatch(t)][:max_expansions]
            for t in terms:
                df = self.df[f][t]
                idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                for i in range(self.n_docs):
                    tf = self.tf[f][i].get(t)
                    if not tf:
                        continue
                    dl = self.dl[f][i]
                    s = w * idf * tf / (
                        tf + self.k1 * (1 - self.b + self.b * dl / avg))
                    di = self.doc_ids[i]
                    scores[di] = scores.get(di, 0.0) + s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def search_fuzzy(self, query: str, k: int = 10,
                     max_edits: int | None = None,
                     prefix_length: int = 0, max_expansions: int = 50,
                     boosts=None) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_fuzzy (same
        expansion order: distance asc then term asc, capped; same
        1 − d/len fuzzy boost)."""
        from baram_ray.index.segment import _dl_distance
        terms = sorted(set(tokenize(query)))
        boosts = boosts or {}
        scores: dict[int, float] = {}
        for f in self.fields:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            for qt in terms:
                me = max_edits
                if me is None:
                    me = 0 if len(qt) < 3 else (1 if len(qt) <= 5 else 2)
                pre = qt[:prefix_length]
                cands = []
                for t in sorted(self.df[f]):
                    if prefix_length and not t.startswith(pre):
                        continue
                    d = _dl_distance(qt, t, me)
                    if d <= me:
                        cands.append((d, t))
                cands.sort()
                for d, t in cands[:max_expansions]:
                    fw = 1.0 if d == 0 else max(0.0, 1.0 - d / len(qt))
                    if fw <= 0.0:
                        continue
                    df = self.df[f][t]
                    idf = math.log(1.0 + (self.n_docs - df + 0.5)
                                   / (df + 0.5))
                    for i in range(self.n_docs):
                        tf = self.tf[f][i].get(t)
                        if not tf:
                            continue
                        dl = self.dl[f][i]
                        s = w * fw * idf * tf / (
                            tf + self.k1 * (1 - self.b
                                            + self.b * dl / avg))
                        di = self.doc_ids[i]
                        scores[di] = scores.get(di, 0.0) + s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def _clause_map(self, spec, boosts=None) -> dict[int, float]:
        """doc→score map for one typed clause spec, each from this
        oracle's own standalone op (shared by search_dismax and
        search_bool_tree)."""
        clause = self._clause_map

        def _inner(spec) -> dict[int, float]:
            if isinstance(spec, str):
                spec = {"match": spec}
            cb = float(spec.get("boost", 1.0))
            if cb != 1.0:
                inner = clause({kk: v for kk, v in spec.items()
                                if kk != "boost"}, boosts)
                return {d: s * cb for d, s in inner.items()}
            if "match" in spec:
                return dict(self.search(spec["match"], k=self.n_docs,
                                        boosts=boosts))
            if "phrase" in spec:
                return dict(self.search_phrase(
                    self._docs, spec["phrase"], k=self.n_docs,
                    boosts=boosts, slop=int(spec.get("slop", 0))))
            if "phrase_prefix" in spec:
                return dict(self.search_phrase_prefix(
                    self._docs, spec["phrase_prefix"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "prefix" in spec:
                return dict(self.search_prefix(
                    spec["prefix"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "wildcard" in spec:
                return dict(self.search_wildcard(
                    spec["wildcard"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "regexp" in spec:
                return dict(self.search_regexp(
                    spec["regexp"], k=self.n_docs,
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            if "fuzzy" in spec:
                return dict(self.search_fuzzy(
                    spec["fuzzy"], k=self.n_docs,
                    max_edits=spec.get("max_edits"),
                    prefix_length=int(spec.get("prefix_length", 0)),
                    max_expansions=int(spec.get("max_expansions", 50)),
                    boosts=boosts))
            raise ValueError(f"unknown clause spec {spec!r}")

        return _inner(spec)

    # ----------------------------------------------------------------- #
    def search_dismax(self, queries: list, tie_breaker: float = 0.0,
                      k: int = 10, boosts=None
                      ) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_dismax: score =
        max matching clause + tie_breaker × Σ of the rest; a doc
        matches if any clause does."""
        maps = [self._clause_map(c, boosts) for c in (queries or [])]
        cands = set()
        for m in maps:
            cands |= set(m)
        scores = {}
        for d in cands:
            ss = [m.get(d, 0.0) for m in maps]
            best = max(ss)
            scores[d] = best + tie_breaker * (sum(ss) - best)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def search_bool_tree(self, node: dict, k: int = 10, boosts=None
                         ) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_bool_tree:
        recursive Lucene BooleanQuery semantics over doc-id SETS and
        per-clause score maps from this oracle's standalone ops. A
        clause's score contributes only where that clause matched
        (mirrors the engine's np.where mask); term/range/match_all
        leaves mask without scoring."""
        from baram_ray.query.dsl import (_filter_entry, _leaf_spec,
                                         _node_kind)
        all_ids = set(self.doc_ids)

        def meta_mask(kind: str, v) -> set[int]:
            col, val = _filter_entry(kind, v)
            vals = self.meta[col]
            if isinstance(val, list):      # terms (IN) filter
                return {d for d, x in zip(self.doc_ids, vals)
                        if x in set(val)}
            if isinstance(val, dict):
                import operator as op
                ops = {"gte": op.ge, "lte": op.le,
                       "gt": op.gt, "lt": op.lt}
                return {d for d, x in zip(self.doc_ids, vals)
                        if all(ops[o](x, b) for o, b in val.items())}
            return {d for d, x in zip(self.doc_ids, vals) if x == val}

        def ev(n: dict) -> tuple[dict[int, float], set[int]]:
            kind = _node_kind(n)
            if kind != "bool":
                if kind in ("term", "terms", "range"):
                    return {}, meta_mask(kind, n[kind])
                if kind == "match_all":
                    return {}, set(all_ids)
                sc = self._clause_map(_leaf_spec(kind, n[kind]),
                                      boosts)
                return sc, set(sc)
            b = n["bool"]

            def grp(g) -> list:
                x = b.get(g) or []
                return x if isinstance(x, list) else [x]

            score: dict[int, float] = {}
            matched = set(all_ids)

            def add(sc: dict, m: set) -> None:
                for d, v in sc.items():
                    if d in m:
                        score[d] = score.get(d, 0.0) + v

            for c in grp("must"):
                sc, m = ev(c)
                add(sc, m)
                matched &= m
            for c in grp("filter"):
                _, m = ev(c)
                matched &= m
            for c in grp("must_not"):
                _, m = ev(c)
                matched -= m
            should = grp("should")
            msm = b.get("minimum_should_match")
            if msm is None:
                msm = 0 if (grp("must") or grp("filter")) else 1
            if should:
                cnt: dict[int, int] = {}
                for c in should:
                    sc, m = ev(c)
                    add(sc, m)
                    for d in m:
                        cnt[d] = cnt.get(d, 0) + 1
                if int(msm) > 0:
                    matched &= {d for d, c0 in cnt.items()
                                if c0 >= int(msm)}
            return score, matched

        score, matched = ev(node)
        rows = [(d, score.get(d, 0.0)) for d in matched]
        return sorted(rows, key=lambda kv: (-kv[1], kv[0]))[:k]

    # ----------------------------------------------------------------- #
    def _phrase_prefix_freq(self, text: str, fixed: list[str],
                            exps: set[str]) -> int:
        """Multi-phrase frequency in one field text: base offsets where
        every fixed token aligns at its slot and ANY expansion term
        aligns at the last slot."""
        toks, poss = tokenize_with_positions(text or "")
        at: dict[str, set[int]] = {}
        for t, p in zip(toks, poss):
            at.setdefault(t, set()).add(p)
        bases: set[int] | None = None
        for i, qt in enumerate(fixed):
            ps = at.get(qt)
            if not ps:
                return 0
            shifted = {p - i for p in ps}
            bases = shifted if bases is None else bases & shifted
            if not bases:
                return 0
        last = set()
        qp = len(fixed)
        for e in exps:
            last.update(p - qp for p in at.get(e, ()))
        bases = last if bases is None else bases & last
        return len(bases)

    def search_phrase_prefix(self, docs: list[dict], query: str,
                             k: int = 10, max_expansions: int = 50,
                             boosts: dict[str, float] | None = None
                             ) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_phrase_prefix:
        the last analyzed token expands to the first max_expansions
        vocabulary terms with that prefix (lexicographic); idf = Σ idf
        of the fixed terms + idf of the expansion-union df; tf = the
        multi-phrase freq."""
        qtoks = analyze_phrase(query)
        if not qtoks:
            return []
        fixed, pre = qtoks[:-1], qtoks[-1]
        boosts = boosts or {}
        scores: dict[int, float] = {}
        for f in self.fields:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            exps = [t for t in sorted(self.df[f])
                    if t.startswith(pre)][:max_expansions]
            if not exps:
                continue
            idf_sum = 0.0
            missing = False
            for t in dict.fromkeys(fixed):
                df = self.df[f].get(t, 0)
                if df == 0:
                    missing = True
                    break
                idf_sum += math.log(
                    1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            if missing:
                continue
            eset = set(exps)
            df_union = sum(1 for c in self.tf[f]
                           if any(e in c for e in eset))
            idf_sum += math.log(
                1.0 + (self.n_docs - df_union + 0.5) / (df_union + 0.5))
            for i, d in enumerate(docs):
                fr = self._phrase_prefix_freq(d.get(f) or "", fixed,
                                              eset)
                if not fr:
                    continue
                dl = self.dl[f][i]
                s = w * idf_sum * fr / (
                    fr + self.k1 * (1 - self.b + self.b * dl / avg))
                di = self.doc_ids[i]
                scores[di] = scores.get(di, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # ----------------------------------------------------------------- #
    def _phrase_freq(self, text: str, qtoks: list[str]) -> int:
        """Exact-phrase frequency in one field text: number of base
        offsets where every query token appears at ``base + i`` in the
        document's word-position stream (tokenizer.tokenize_with_positions
        semantics — compound parts share their word's position)."""
        toks, poss = tokenize_with_positions(text or "")
        at: dict[str, set[int]] = {}
        for t, p in zip(toks, poss):
            at.setdefault(t, set()).add(p)
        bases: set[int] | None = None
        for i, qt in enumerate(qtoks):
            ps = at.get(qt)
            if not ps:
                return 0
            shifted = {p - i for p in ps}
            bases = shifted if bases is None else bases & shifted
            if not bases:
                return 0
        return len(bases or ())

    def _sloppy_freq_text(self, text: str, qtoks: list[str],
                          slop: int) -> float:
        """Brute-force sloppy phrase frequency, implemented INDEPENDENTLY
        of the engine's plane-sweep: enumerate every ordered chain
        p_1 < … < p_m (p_j a position of query token j), keep the spans
        that are MINIMAL under interval containment, and sum
        ``1/(1+slack)`` over those with ``slack = (e-s)-(m-1) ≤ slop``.
        The containment-minimal span set provably equals the plane-sweep
        enumeration, so engine and oracle must agree exactly."""
        toks, poss = tokenize_with_positions(text or "")
        at: dict[str, list[int]] = {}
        for t, p in zip(toks, poss):
            at.setdefault(t, []).append(p)
        lists = [sorted(set(at.get(t, []))) for t in qtoks]
        if any(not lst for lst in lists):
            return 0.0
        chains: list[tuple[int, ...]] = [(p,) for p in lists[0]]
        for lst in lists[1:]:
            chains = [c + (p,) for c in chains for p in lst if p > c[-1]]
            if not chains:
                return 0.0
        spans = {(c[0], c[-1]) for c in chains}
        minimal = sorted((s, e) for (s, e) in spans
                         if not any(s2 >= s and e2 <= e
                                    and (s2, e2) != (s, e)
                                    for (s2, e2) in spans))
        m = len(qtoks)
        # accumulate in increasing-start order, matching the engine's
        # plane-sweep addition order bit-for-bit
        fr = 0.0
        for s, e in minimal:
            if (e - s) - (m - 1) <= slop:
                fr += 1.0 / (1.0 + ((e - s) - (m - 1)))
        return fr

    def search_phrase(self, docs: list[dict], query: str, k: int = 10,
                      boosts: dict[str, float] | None = None,
                      slop: int = 0
                      ) -> list[tuple[int, float]]:
        """Brute-force reference for QueryEngine.search_phrase: phrase =
        one composite term per field (idf = Σ unique-term idfs, tf =
        phrase freq — sloppy windowed freq when ``slop > 0``),
        bool-should across fields."""
        qtoks = analyze_phrase(query)
        if not qtoks:
            return []
        boosts = boosts or {}
        uniq = list(dict.fromkeys(qtoks))
        scores: dict[int, float] = {}
        for f in self.fields:
            w = float(boosts.get(f, 1.0))
            avg = self.avgdl[f] or 1.0
            idf_sum = 0.0
            missing = False
            for t in uniq:
                df = self.df[f].get(t, 0)
                if df == 0:
                    missing = True
                    break
                idf_sum += math.log(
                    1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            if missing:
                continue
            for i, d in enumerate(docs):
                fr = (self._sloppy_freq_text(d.get(f) or "", qtoks, slop)
                      if slop > 0 else
                      self._phrase_freq(d.get(f) or "", qtoks))
                if not fr:
                    continue
                dl = self.dl[f][i]
                s = w * idf_sum * fr / (
                    fr + self.k1 * (1 - self.b + self.b * dl / avg))
                di = self.doc_ids[i]
                scores[di] = scores.get(di, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
