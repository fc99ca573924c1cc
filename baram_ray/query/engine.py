"""Native BM25 top-k over compressed postings: exhaustive DAAT + block-max WAND.

The rebuild of the reference's delegated query core
(``src/embedding/mod.rs:469-535``: bool-should over boosted fields,
``minimum_should_match: 1``, k default 10, optional ``min_score``
``:623-625``, term filters ``:509-532``). Semantics + accumulation order are
defined by :mod:`baram_ray.query.oracle`; both algorithms here are
rank-identical to it (tested).

- ``algorithm="daat"``: decode every matching posting (cached per resident
  engine), vectorized numpy scoring, exact top-k. O(total postings).
- ``algorithm="wand"``: document-at-a-time WAND with per-term upper bounds
  + block-max skipping over the encoded blocks — sub-linear in postings
  when k ≪ matches.
- ``algorithm="auto"`` (default): DAAT unless the corpus is large and the
  query selective — the vectorized exhaustive path wins whenever most docs
  match anyway (head-term queries), WAND wins on big-corpus selective
  queries where pruning skips most blocks.

``QueryActor`` is the actor-pool form: constructed once per actor with the
index resident (``ds.map_batches(QueryActor, concurrency=N)`` over a query
table), the Ray shape of SURVEY.md §3.2.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd

from baram_ray.index.segment import IndexReader, PostingList

# clause-spec kinds accepted by search_compound / match_compound_docs
CLAUSE_KINDS = ("match", "phrase", "phrase_prefix", "prefix",
                "wildcard", "regexp", "fuzzy")


def clause_kind(spec) -> str:
    """Kind of a compound clause spec: a bare string is a match clause;
    a dict must carry exactly one kind key from ``CLAUSE_KINDS``."""
    if isinstance(spec, str):
        return "match"
    kinds = [k for k in CLAUSE_KINDS if k in spec]
    if len(kinds) != 1:
        raise ValueError(
            f"clause spec needs exactly one of {CLAUSE_KINDS}: {spec!r}")
    return kinds[0]


class _RevKey:
    """Inverts comparison order for arbitrary comparable sort values
    (descending merge key when the value type may not be negatable)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


# phrase auto-policy: below this rarest-term df the skip-loop (which only
# decodes blocks the rarest term steers to) wins; above it the vectorized
# whole-postings intersection wins (tests force both paths)
PHRASE_VEC_MIN_DF = 2048


class _TermIter:
    """Posting iterator with galloping next_geq over blocks (skip via max_doc)."""

    __slots__ = ("pl", "weight", "idf", "ub", "block", "docs", "tfs", "pos",
                 "doc", "field", "term", "dl", "avg_c")

    DONE = 1 << 63          # doc_ids are 63-bit (stages.normalize.derive_doc_id)

    def __init__(self, field: str, term: str, pl: PostingList, idf: float,
                 weight: float, k1: float, b: float):
        self.pl = pl
        self.field = field
        self.term = term
        self.idf = idf
        self.weight = weight
        c = k1 * (1.0 - b)
        # dl→0 upper bound: tf/(tf+k1(1-b)) is the max of the saturation term
        mt = float(pl.max_tfs.max())
        self.ub = weight * idf * mt / (mt + c)
        self.avg_c = c
        self.block = -1
        self.docs = self.tfs = None
        self.pos = 0
        self.doc = -1
        self._load_block(0)

    def _load_block(self, i: int) -> None:
        if i >= self.pl.n_blocks:
            self.doc = self.DONE
            return
        self.block = i
        self.docs, self.tfs = self.pl.decode(i)
        self.pos = 0
        self.doc = int(self.docs[0])

    def next_geq(self, target: int) -> int:
        if self.doc >= target:
            return self.doc
        # find first block whose max_doc >= target
        bi = int(np.searchsorted(self.pl.max_docs, target, side="left"))
        if bi >= self.pl.n_blocks:
            self.doc = self.DONE
            return self.doc
        if bi != self.block:
            self._load_block(bi)
        p = int(np.searchsorted(self.docs, target, side="left"))
        if p >= len(self.docs):           # target beyond this block
            self._load_block(self.block + 1)
            return self.doc
        self.pos = p
        self.doc = int(self.docs[p])
        return self.doc

    def advance(self) -> int:
        self.pos += 1
        if self.pos < len(self.docs):
            self.doc = int(self.docs[self.pos])
        else:
            self._load_block(self.block + 1)
        return self.doc

    def block_ub_at(self, target: int) -> tuple[float, int]:
        """(upper bound of the block containing/next after target, its max_doc).

        Shallow: uses stored block metadata only, no decode (block-max WAND).
        """
        bi = int(np.searchsorted(self.pl.max_docs, target, side="left"))
        if bi >= self.pl.n_blocks:
            return 0.0, self.DONE
        mt = float(self.pl.max_tfs[bi])
        return (self.weight * self.idf * mt / (mt + self.avg_c),
                int(self.pl.max_docs[bi]))

    def score_at(self, row_dl: float, avgdl: float, k1: float, b: float) -> float:
        tf = float(self.tfs[self.pos])
        return self.weight * self.idf * tf / (
            tf + k1 * (1.0 - b + (b * row_dl) / avgdl))

    def positions_at(self) -> np.ndarray:
        """Word positions of the current posting (positional index only)."""
        flat, offs = self.pl.decode_pos(self.block)
        return flat[offs[self.pos]: offs[self.pos + 1]]


class QueryEngine:
    def __init__(self, index_dir: str,
                 shard_range: tuple[int, int] | None = None):
        self.r = IndexReader(index_dir, shard_range=shard_range)
        self.k1 = self.r.k1
        self.b = self.r.b

    def refresh(self) -> bool:
        """Make newly-committed index state (delta ingest, deletes,
        purge) visible to this live engine without a restart — the
        reference backend's 5-second index refresh
        (``src/embedding/mod.rs:240-245``) made explicit. Returns True
        when the reader re-opened, False on the no-change fast path."""
        changed = self.r.refresh()
        if changed:
            self.k1, self.b = self.r.k1, self.r.b
        return changed

    # ------------------------------------------------------------------ #
    def _iters(self, query: str, boosts: dict[str, float] | None,
               fields: list[str] | None = None):
        from baram_ray.tokenizer import tokenize
        terms = sorted(set(tokenize(query)))
        boosts = boosts or {}
        if fields is not None:
            unknown = set(fields) - set(self.r.fields)
            if unknown:
                from baram_ray.errors import UnknownFilterColumn
                raise UnknownFilterColumn(sorted(unknown)[0])
        its: list[_TermIter] = []
        n = self.r.n_docs
        # reader field order (restricted to the requested subset), then
        # sorted terms — accumulation order is fixed regardless of the
        # caller's fields list order, so fp sums are reproducible
        use = (self.r.fields if fields is None
               else [f for f in self.r.fields if f in set(fields)])
        for f in use:                           # field order, then sorted terms
            w = float(boosts.get(f, 1.0))
            for t in terms:
                pl = self.r.postings.get((f, t))
                if pl is None:
                    continue
                df = self.r.df_global(f, t, pl)   # global idf even when
                # the reader holds only a shard range (sharded actors)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                its.append(_TermIter(f, t, pl, idf, w, self.k1, self.b))
        return its

    def search(self, query: str, k: int = 10,
               boosts: dict[str, float] | None = None,
               filters: dict | None = None,
               min_score: float | None = None,
               algorithm: str = "auto",
               after: tuple[float, int] | None = None,
               fields: list[str] | None = None
               ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), sorted (score desc, doc_id asc).

        ``after=(score, doc_id)``: resume strictly after that sort key —
        search_after pagination (reference scroll loop,
        ``src/clustering/engine.rs:152-280``; OpenSearch search_after).
        Deterministic scoring makes the (score, doc_id) cursor exact.

        ``fields``: restrict matching AND scoring to a subset of the
        indexed fields (OpenSearch multi_match field list; docs whose
        only hits are in other fields do not match). Combine with
        per-field ``boosts`` for the ``field^w`` syntax.
        """
        its = self._iters(query, boosts, fields)
        if not its or k <= 0:
            return []
        mask = self.r.filter_mask(filters)
        if algorithm == "auto":
            # vectorized exhaustive scoring beats the per-posting Python
            # WAND loop unless pruning can skip most of a large corpus:
            # prefer WAND only when the corpus is big AND the query is
            # selective (low total df ⇒ few candidates to visit).
            total_df = sum(it.pl.df for it in its)
            algorithm = ("wand" if self.r.n_docs > 2_000_000
                         and total_df < self.r.n_docs // 10 else "daat")
        if algorithm == "daat":
            hits = self._daat(its, k, mask, after)
        else:
            hits = self._wand(its, k, mask, after)
        if min_score is not None:
            hits = [(d, s) for d, s in hits if s >= min_score]
        return hits

    # ------------------------------------------------------------------ #
    def explain(self, query: str, doc_id: int,
                boosts: dict[str, float] | None = None) -> dict:
        """Score explanation for one document (the OpenSearch `_explain`
        surface the reference gets for free from its backend): per
        (field, term) BM25 components — tf, df, idf, dl, avgdl, boost
        and the partial score — accumulated in the SAME (field-order,
        sorted-term) order the scoring path uses, so ``total`` equals
        the ``search`` score bit-for-bit (asserted in tests)."""
        r = self.r
        row = int(np.searchsorted(r.doc_ids, doc_id))
        if row >= len(r.doc_ids) or int(r.doc_ids[row]) != doc_id:
            raise KeyError(f"doc_id {doc_id} not in index/shard range")
        rank = row + r.rank_base
        details: list[dict] = []
        total = 0.0
        for it in self._iters(query, boosts):
            if it.next_geq(rank) != rank:
                continue
            tf = float(it.tfs[it.pos])
            dl = float(r.dl[it.field][row])
            avg = float(r.avgdl[it.field] or 1.0)
            norm = tf + self.k1 * (1.0 - self.b + (self.b * dl) / avg)
            s = it.weight * it.idf * tf / norm
            total += s
            details.append({
                "field": it.field, "term": it.term,
                "tf": tf,
                "df": int(r.df_global(it.field, it.term, it.pl)),
                "idf": it.idf,
                "dl": dl, "avgdl": avg, "boost": it.weight,
                "score": s,
                "description": (
                    f"weight({it.field}:{it.term}) = boost {it.weight} "
                    f"* idf {it.idf:.6f} * tf {tf:.0f} / "
                    f"(tf + k1*(1-b+b*dl/avgdl)) {norm:.6f}"),
            })
        return {"doc_id": int(doc_id), "score": total,
                "matched": bool(details), "details": details}

    # ------------------------------------------------------------------ #
    # Boolean queries — the reference's bool DSL one level up from
    # bool-should-over-fields (src/embedding/mod.rs:475-535: should +
    # minimum_should_match + filter; must_not is the OpenSearch
    # complement). Each clause is a match query (analyzed string, any
    # field); scoring = BM25 sum over the matching must/should clauses.
    # ------------------------------------------------------------------ #
    def _clause_eval(self, clause: str, boosts, fields=None):
        """(score array, matched mask) for one match clause — exhaustive
        vectorized scoring over local rows (optionally restricted to a
        field subset, the multi_match per-field form)."""
        r = self.r
        acc = np.zeros(len(r.doc_ids), dtype=np.float64)
        matched = np.zeros(len(r.doc_ids), dtype=bool)
        for it in self._iters(clause, boosts, fields):
            rows, tfs = it.pl.decode_all()
            if r.rank_base:
                rows = rows - r.rank_base
            dl = r.dl[it.field][rows]
            avg = r.avgdl[it.field] or 1.0
            tff = tfs.astype(np.float64)
            s = (it.weight * it.idf) * tff / (
                tff + self.k1 * ((1.0 - self.b) + (self.b * dl) / avg))
            np.add.at(acc, rows, s)
            matched[rows] = True
        return acc, matched

    def search_bool(self, must: list[str] | None = None,
                    should: list[str] | None = None,
                    must_not: list[str] | None = None,
                    minimum_should_match: int | None = None,
                    k: int = 10,
                    boosts: dict[str, float] | None = None,
                    filters: dict | None = None,
                    min_score: float | None = None
                    ) -> list[tuple[int, float]]:
        """Boolean top-k: every ``must`` clause matches, no ``must_not``
        clause matches, and ≥ ``minimum_should_match`` of the ``should``
        clauses match (default: 1 when there are no must clauses, else 0
        — OpenSearch's default). Score = Σ BM25 of matching must+should
        clauses; must_not never scores. Sorted (score desc, doc_id asc)."""
        must, should, must_not = must or [], should or [], must_not or []
        r = self.r
        if minimum_should_match is None:
            minimum_should_match = 1 if (should and not must) else 0
        if not must and not should:
            return []
        acc = np.zeros(len(r.doc_ids), dtype=np.float64)
        ok = np.ones(len(r.doc_ids), dtype=bool)
        any_scored = np.zeros(len(r.doc_ids), dtype=bool)
        for c in must:
            s, m = self._clause_eval(c, boosts)
            acc += s
            ok &= m
            any_scored |= m
        if should:
            n_should = np.zeros(len(r.doc_ids), dtype=np.int64)
            for c in should:
                s, m = self._clause_eval(c, boosts)
                acc += s
                n_should += m
                any_scored |= m
            ok &= n_should >= minimum_should_match
        for c in must_not:
            _, m = self._clause_eval(c, boosts)
            ok &= ~m
        ok &= any_scored        # a hit must match ≥1 scoring clause
        mask = r.filter_mask(filters)
        if mask is not None:
            ok &= mask
        cand = np.nonzero(ok)[0]
        if len(cand) == 0 or k <= 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -acc[cand]))
        top = cand[order[:k]]
        out = [(int(r.doc_ids[i]), float(acc[i])) for i in top]
        if min_score is not None:
            out = [(d, s) for d, s in out if s >= min_score]
        return out

    def match_bool_docs(self, must: list[str] | None = None,
                        should: list[str] | None = None,
                        must_not: list[str] | None = None,
                        minimum_should_match: int | None = None,
                        filters: dict | None = None) -> np.ndarray:
        """Boolean RETRIEVAL (no scoring): sorted doc_ids satisfying the
        bool predicate — the SQL-checkable core of ``search_bool``."""
        hits = self.search_bool(must, should, must_not,
                                minimum_should_match,
                                k=len(self.r.doc_ids), filters=filters)
        return np.sort(np.array([d for d, _ in hits], dtype=np.int64))

    # ------------------------------------------------------------------ #
    # Compound boolean queries — bool occurrence logic over TYPED
    # sub-queries, the full OpenSearch bool surface the reference's
    # backend accepts around its query_string/multi_match path
    # (src/embedding/mod.rs:470-539): any mix of match / phrase /
    # prefix / wildcard / fuzzy clauses in must / should / must_not.
    # A clause spec is a dict with exactly one kind key (a bare string
    # is shorthand for a match clause):
    #   {"match": "analyzed text"}
    #   {"phrase": "a b", "slop": 0, "fields": [...]}
    #   {"prefix": "pre", "max_expansions": 50}
    #   {"wildcard": "w?ld*", "max_expansions": 50}
    #   {"fuzzy": "term", "max_edits": None, "prefix_length": 0,
    #    "max_expansions": 50}
    # Each clause scores exactly like its standalone search_* op (same
    # expansion order and arithmetic — a single-clause compound is
    # score-identical to the dedicated call, tested), so the combined
    # score is Σ BM25 of the matching must+should clauses.
    # ------------------------------------------------------------------ #
    def _phrase_arrays(self, query: str, slop: int = 0,
                       fields: list[str] | None = None,
                       boosts: dict[str, float] | None = None
                       ) -> tuple[np.ndarray, np.ndarray]:
        """(score array, matched mask) over local rows for one phrase
        clause — same per-row arithmetic and accumulation order as
        ``search_phrase`` (score-identical, tested)."""
        r = self.r
        acc = np.zeros(len(r.doc_ids), dtype=np.float64)
        matched = np.zeros(len(r.doc_ids), dtype=bool)
        for f, w, idf_sum, freqs in self._phrase_freqs(query, fields,
                                                       boosts, slop):
            avg = r.avgdl[f] or 1.0
            dl = r.dl[f]
            for rank, fr in freqs.items():
                row = rank - r.rank_base
                acc[row] += w * idf_sum * fr / (
                    fr + self.k1 * (1.0 - self.b
                                    + (self.b * dl[row]) / avg))
                matched[row] = True
        return acc, matched

    def _spec_arrays(self, spec, boosts: dict[str, float] | None
                     ) -> tuple[np.ndarray, np.ndarray]:
        """(score array, matched mask) for one typed clause spec. A
        ``boost`` key scales the clause's scores (OpenSearch clause
        boost; matching is unaffected)."""
        cb = float(spec.get("boost", 1.0)) if isinstance(spec, dict) \
            else 1.0
        if cb != 1.0:
            spec = {k: v for k, v in spec.items() if k != "boost"}
            acc, matched = self._spec_arrays(spec, boosts)
            return acc * cb, matched
        kind = clause_kind(spec)
        if isinstance(spec, str):
            spec = {"match": spec}
        if kind == "match":
            return self._clause_eval(spec["match"], boosts,
                                     spec.get("fields"))
        if kind == "phrase":
            return self._phrase_arrays(spec["phrase"],
                                       slop=int(spec.get("slop", 0)),
                                       fields=spec.get("fields"),
                                       boosts=boosts)
        if kind == "phrase_prefix":
            r2 = self.r
            acc = np.zeros(len(r2.doc_ids), dtype=np.float64)
            matched = np.zeros(len(r2.doc_ids), dtype=bool)
            per_field = self._phrase_prefix_freqs(
                spec["phrase_prefix"], fields=spec.get("fields"),
                boosts=boosts,
                max_expansions=int(spec.get("max_expansions", 50)))
            for f, w, idf_sum, freqs in per_field:
                avg = r2.avgdl[f] or 1.0
                dl = r2.dl[f]
                for rank, fr in freqs.items():
                    row = rank - r2.rank_base
                    acc[row] += w * idf_sum * fr / (
                        fr + self.k1 * (1.0 - self.b
                                        + (self.b * dl[row]) / avg))
                    matched[row] = True
            return acc, matched
        from baram_ray.tokenizer import tokenize
        r = self.r
        b = boosts or {}
        mx = int(spec.get("max_expansions", 50))
        zero = (np.zeros(len(r.doc_ids), dtype=np.float64),
                np.zeros(len(r.doc_ids), dtype=bool))
        if kind == "prefix":
            toks = tokenize(spec["prefix"])
            if not toks:
                return zero
            pre = toks[0]
            exps = ((f, t, float(b.get(f, 1.0)))
                    for f in r.fields
                    for t in r.terms_with_prefix(f, pre, mx))
            return self._exp_arrays(exps)
        if kind == "wildcard":
            pat = spec["wildcard"].strip().lower()
            if not pat:
                return zero
            exps = ((f, t, float(b.get(f, 1.0)))
                    for f in r.fields
                    for t in r.terms_wildcard(f, pat, mx))
            return self._exp_arrays(exps)
        if kind == "regexp":
            pat = spec["regexp"].strip().lower()
            if not pat:
                return zero
            exps = ((f, t, float(b.get(f, 1.0)))
                    for f in r.fields
                    for t in r.terms_regexp(f, pat, mx))
            return self._exp_arrays(exps)
        # fuzzy — same expansion order and 1 − d/len boost as
        # search_fuzzy
        from baram_ray.index.segment import _dl_distance
        terms = sorted(set(tokenize(spec["fuzzy"])))
        if not terms:
            return zero
        max_edits = spec.get("max_edits")
        plen = int(spec.get("prefix_length", 0))

        def exps():
            for f in r.fields:
                w = float(b.get(f, 1.0))
                for qt in terms:
                    me = max_edits
                    if me is None:
                        me = 0 if len(qt) < 3 else (1 if len(qt) <= 5
                                                    else 2)
                    for e in r.terms_fuzzy(f, qt, me, plen, mx):
                        d = _dl_distance(qt, e, me)
                        fw = 1.0 if d == 0 else max(0.0,
                                                    1.0 - d / len(qt))
                        yield f, e, w * fw

        return self._exp_arrays(exps())

    def search_compound(self, must: list | None = None,
                        should: list | None = None,
                        must_not: list | None = None,
                        minimum_should_match: int | None = None,
                        k: int = 10,
                        boosts: dict[str, float] | None = None,
                        filters: dict | None = None,
                        min_score: float | None = None
                        ) -> list[tuple[int, float]]:
        """Compound boolean top-k over typed clause specs: every
        ``must`` clause matches, no ``must_not`` clause matches, and
        ≥ ``minimum_should_match`` of the ``should`` clauses match
        (default 1 when there are no must clauses, else 0 —
        OpenSearch's rule, same as ``search_bool``). Score = Σ of each
        matching must+should clause's standalone BM25 score; must_not
        never scores. Sorted (score desc, doc_id asc)."""
        must, should, must_not = must or [], should or [], must_not or []
        r = self.r
        if minimum_should_match is None:
            minimum_should_match = 1 if (should and not must) else 0
        if not must and not should:
            return []
        acc = np.zeros(len(r.doc_ids), dtype=np.float64)
        ok = np.ones(len(r.doc_ids), dtype=bool)
        any_scored = np.zeros(len(r.doc_ids), dtype=bool)
        for c in must:
            s, m = self._spec_arrays(c, boosts)
            acc += s
            ok &= m
            any_scored |= m
        if should:
            n_should = np.zeros(len(r.doc_ids), dtype=np.int64)
            for c in should:
                s, m = self._spec_arrays(c, boosts)
                acc += s
                n_should += m
                any_scored |= m
            ok &= n_should >= minimum_should_match
        for c in must_not:
            _, m = self._spec_arrays(c, boosts)
            ok &= ~m
        ok &= any_scored        # a hit must match ≥1 scoring clause
        mask = r.filter_mask(filters)
        if mask is not None:
            ok &= mask
        cand = np.nonzero(ok)[0]
        if len(cand) == 0 or k <= 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -acc[cand]))
        top = cand[order[:k]]
        out = [(int(r.doc_ids[i]), float(acc[i])) for i in top]
        if min_score is not None:
            out = [(d, s) for d, s in out if s >= min_score]
        return out

    def match_compound_docs(self, must: list | None = None,
                            should: list | None = None,
                            must_not: list | None = None,
                            minimum_should_match: int | None = None,
                            filters: dict | None = None) -> np.ndarray:
        """Compound boolean RETRIEVAL (no scoring): sorted doc_ids
        satisfying the typed-clause bool predicate — the SQL-checkable
        core of ``search_compound``."""
        hits = self.search_compound(must, should, must_not,
                                    minimum_should_match,
                                    k=len(self.r.doc_ids),
                                    filters=filters)
        return np.sort(np.array([d for d, _ in hits], dtype=np.int64))

    def search_dismax(self, queries: list, tie_breaker: float = 0.0,
                      k: int = 10,
                      boosts: dict[str, float] | None = None,
                      filters: dict | None = None,
                      min_score: float | None = None
                      ) -> list[tuple[int, float]]:
        """Disjunction-max top-k (Lucene ``DisjunctionMaxQuery``, the
        OpenSearch ``dis_max`` body): a doc matches if ANY clause
        matches; score = best matching clause's score +
        ``tie_breaker`` × Σ of the other matching clauses' scores.
        Clauses are the same typed specs as ``search_compound`` (each
        scores exactly like its standalone op). tie_breaker 0 is pure
        max (the Lucene default); 1 degenerates to the compound sum.
        Sorted (score desc, doc_id asc)."""
        if not queries:
            return []
        r = self.r
        n = len(r.doc_ids)
        best = np.zeros(n, dtype=np.float64)
        total = np.zeros(n, dtype=np.float64)
        any_m = np.zeros(n, dtype=bool)
        for spec in queries:
            s, m = self._spec_arrays(spec, boosts)
            s = np.where(m, s, 0.0)
            np.maximum(best, s, out=best)
            total += s
            any_m |= m
        acc = best + tie_breaker * (total - best)
        mask = r.filter_mask(filters)
        if mask is not None:
            any_m &= mask
        cand = np.nonzero(any_m)[0]
        if len(cand) == 0 or k <= 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -acc[cand]))
        top = cand[order[:k]]
        out = [(int(r.doc_ids[i]), float(acc[i])) for i in top]
        if min_score is not None:
            out = [(d, s) for d, s in out if s >= min_score]
        return out

    def match_dismax_docs(self, queries: list,
                          filters: dict | None = None) -> np.ndarray:
        """dis_max RETRIEVAL (no scoring): sorted doc_ids matching ANY
        clause — the SQL-checkable union core of ``search_dismax``."""
        hits = self.search_dismax(queries, k=len(self.r.doc_ids),
                                  filters=filters)
        return np.sort(np.array([d for d, _ in hits], dtype=np.int64))

    def search_rescore(self, query: str, rescore_node: dict,
                       k: int = 10, window_size: int = 50,
                       query_weight: float = 1.0,
                       rescore_query_weight: float = 1.0,
                       filters: dict | None = None
                       ) -> list[tuple[int, float]]:
        """OpenSearch ``rescore`` (QueryRescorer): take the primary
        BM25 top-``window_size``, recombine each hit's score as
        query_weight × primary + rescore_query_weight × secondary
        (secondary = the rescore clause's score where it matches, 0
        otherwise — Lucene's total-hit behavior), re-sort the window,
        return top-k. Docs OUTSIDE the window keep their primary rank
        below every window doc (the window is a strict head), so only
        window_size × (scores) move — the cheap precision-bump shape
        that avoids running the expensive clause corpus-wide.
        ``rescore_node`` is a DSL leaf or bool node (evaluated through
        the tree evaluator, so any nesting works)."""
        hits = self.search(query, k=window_size, filters=filters)
        if not hits or k <= 0:
            return []
        r = self.r
        s2, m2 = self._eval_bool_tree(rescore_node)
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        rows = np.searchsorted(r.doc_ids, ids)
        sec = np.where(m2[rows], s2[rows], 0.0)
        comb = (query_weight * np.array([s for _, s in hits])
                + rescore_query_weight * sec)
        order = np.lexsort((ids, -comb))[:k]
        return [(int(ids[i]), float(comb[i])) for i in order]

    def search_boosting(self, positive: dict, negative: dict,
                        negative_boost: float = 0.5, k: int = 10,
                        filters: dict | None = None
                        ) -> list[tuple[int, float]]:
        """OpenSearch ``boosting`` query: docs matching ``positive``
        (any DSL leaf/bool node) keep their score, DEMOTED — not
        excluded — by × ``negative_boost`` where ``negative`` also
        matches (Lucene BoostingQuery; the soft version of must_not).
        Sorted (score desc, doc_id asc)."""
        r = self.r
        s, m = self._eval_bool_tree(positive)
        _, neg = self._eval_bool_tree(negative)
        s = np.where(neg, s * float(negative_boost), s)
        mask = r.filter_mask(filters)
        if mask is not None:
            m = m & mask
        cand = np.nonzero(m)[0]
        if len(cand) == 0 or k <= 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -s[cand]))
        return [(int(r.doc_ids[i]), float(s[i]))
                for i in cand[order[:k]]]

    def rescore_scores(self, rescore_node: dict,
                       doc_ids: list[int]) -> dict[int, float]:
        """Secondary scores for the given doc_ids where the rescore
        clause matches (ids not in this reader/shard are omitted) —
        the per-shard half of the sharded rescore."""
        r = self.r
        ids = np.asarray(sorted(doc_ids), dtype=np.int64)
        rows = np.searchsorted(r.doc_ids, ids)
        ok = rows < len(r.doc_ids)
        ok[ok] &= r.doc_ids[rows[ok]] == ids[ok]
        if not ok.any():
            return {}
        s2, m2 = self._eval_bool_tree(rescore_node)
        rws = rows[ok]
        return {int(d): float(s)
                for d, s, m in zip(ids[ok], s2[rws], m2[rws]) if m}

    def _eval_bool_tree(self, node: dict,
                        boosts: dict[str, float] | None = None
                        ) -> tuple[np.ndarray, np.ndarray]:
        """(score, matched) arrays for an arbitrarily NESTED bool tree
        (Lucene BooleanQuery semantics, the recursion OpenSearch
        compiles natively): a bool node matches when all must/filter
        children match, no must_not child matches, and ≥
        minimum_should_match should children match (default 0 when
        must/filter present, else 1 — OpenSearch's rule); its score is
        Σ of matching scoring children (must + should; filter and
        term/range leaves mask only, the engine's existing
        convention). A nested bool contributes its summed internal
        score where it matches. Leaves evaluate through
        ``_spec_arrays`` so every typed clause scores exactly like its
        standalone op."""
        from baram_ray.query import dsl as _dsl
        n = len(self.r.doc_ids)
        kind = _dsl._node_kind(node)
        if kind != "bool":
            if kind in ("term", "terms", "range", "exists"):
                col, val = _dsl._filter_entry(kind, node[kind])
                m = self.r.filter_mask({col: val})
                return np.zeros(n), m
            if kind == "match_all":
                live = self.r.filter_mask(None)
                return np.zeros(n), (live if live is not None
                                     else np.ones(n, dtype=bool))
            return self._spec_arrays(_dsl._leaf_spec(kind, node[kind]),
                                     boosts)
        b = node["bool"]

        def group(g) -> list:
            v = b.get(g) or []
            return v if isinstance(v, list) else [v]

        score = np.zeros(n, dtype=np.float64)
        matched = np.ones(n, dtype=bool)
        for c in group("must"):
            s, m = self._eval_bool_tree(c, boosts)
            score += np.where(m, s, 0.0)
            matched &= m
        for c in group("filter"):
            _, m = self._eval_bool_tree(c, boosts)
            matched &= m
        for c in group("must_not"):
            _, m = self._eval_bool_tree(c, boosts)
            matched &= ~m
        should = group("should")
        msm = b.get("minimum_should_match")
        if msm is None:
            msm = 0 if (group("must") or group("filter")) else 1
        if should:
            cnt = np.zeros(n, dtype=np.int64)
            for c in should:
                s, m = self._eval_bool_tree(c, boosts)
                score += np.where(m, s, 0.0)
                cnt += m
            if int(msm) > 0:
                matched &= cnt >= int(msm)
        return score, matched

    def search_bool_tree(self, node: dict, k: int = 10,
                         boosts: dict[str, float] | None = None,
                         filters: dict | None = None,
                         min_score: float | None = None
                         ) -> list[tuple[int, float]]:
        """Top-k over a NESTED bool query tree (see
        ``_eval_bool_tree``) — the general OpenSearch ``bool``-inside-
        ``bool`` body the flat ``search_bool``/``search_compound``
        paths refuse. Sorted (score desc, doc_id asc); flat trees are
        score-identical to ``search_compound`` (tested)."""
        r = self.r
        score, matched = self._eval_bool_tree(node, boosts)
        mask = r.filter_mask(filters)        # + tombstones when None
        if mask is not None:
            matched &= mask
        cand = np.nonzero(matched)[0]
        if len(cand) == 0 or k <= 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -score[cand]))
        out = [(int(r.doc_ids[i]), float(score[i]))
               for i in cand[order[:k]]]
        if min_score is not None:
            out = [(d, s) for d, s in out if s >= min_score]
        return out

    def match_bool_tree_docs(self, node: dict,
                             filters: dict | None = None) -> np.ndarray:
        """Nested-bool RETRIEVAL (no scoring): sorted doc_ids of the
        tree's match set — the SQL-checkable core of
        ``search_bool_tree``."""
        hits = self.search_bool_tree(node, k=len(self.r.doc_ids),
                                     filters=filters)
        return np.sort(np.array([d for d, _ in hits], dtype=np.int64))

    def search_constant_score(self, boost: float = 1.0, k: int = 10,
                              query: str = "",
                              filters: dict | None = None
                              ) -> list[tuple[int, float]]:
        """Constant-score retrieval (OpenSearch ``constant_score``): every
        doc in the filter-context match set (conjunctive ``query`` terms
        ∩ metadata ``filters``; empty query = whole live corpus) scores
        exactly ``boost``. Equal scores tie-break doc_id asc, so the
        result is the first k matching doc_ids."""
        ok = self._conj_mask(query, filters)
        rows = np.nonzero(ok)[0]
        if len(rows) == 0 or k <= 0:
            return []
        ids = np.sort(self.r.doc_ids[rows])[:k]
        return [(int(d), float(boost)) for d in ids]

    _FVF_MODIFIERS = ("none", "ln1p", "log1p", "sqrt", "square",
                      "reciprocal")

    @classmethod
    def _fvf(cls, vals: np.ndarray, factor: float,
             modifier: str) -> np.ndarray:
        """field_value_factor function values (OpenSearch modifier
        vocabulary; ``log1p`` is the COMMON log like OpenSearch's,
        ``ln1p`` the natural one). The log modifiers go through LIBM
        (``math.log`` over the UNIQUE values, mapped back) — numpy's
        SIMD log differs from libm by 1 ulp on ~20% of inputs, and
        libm is what DuckDB's ``ln``/``log10`` call, so this keeps the
        SQL oracle bit-exact. sqrt is IEEE-correctly-rounded
        everywhere; the rest are exact arithmetic."""
        x = vals.astype(np.float64) * factor
        if modifier == "none":
            return x
        if modifier in ("ln1p", "log1p"):
            fn = math.log if modifier == "ln1p" else math.log10
            uniq, inv = np.unique(x, return_inverse=True)
            return np.array([fn(1.0 + u) for u in uniq.tolist()],
                            dtype=np.float64)[inv]
        if modifier == "sqrt":
            return np.sqrt(x)
        if modifier == "square":
            return x * x
        if modifier == "reciprocal":
            return 1.0 / x
        raise ValueError(f"unknown field_value_factor modifier "
                         f"{modifier!r} — use one of "
                         f"{cls._FVF_MODIFIERS}")

    def search_function_score(self, query: str = "", k: int = 10,
                              field: str = "", factor: float = 1.0,
                              modifier: str = "none",
                              boost_mode: str = "replace",
                              filters: dict | None = None
                              ) -> list[tuple[int, float]]:
        """OpenSearch ``function_score`` with a ``field_value_factor``
        function over a kept NUMERIC metadata column: fn =
        modifier(factor × field_value). boost_mode ``replace`` scores
        every doc in the filter-context match set (conjunctive
        ``query`` terms ∩ ``filters``) by fn alone — fully
        deterministic, the SQL-oracled form. ``multiply`` rescores the
        BM25 match set by bm25 × fn (Lucene's default combine; global
        idf keeps the sharded merge score-identical). Sorted
        (score desc, doc_id asc)."""
        r = self.r
        if k <= 0:
            return []
        if boost_mode == "replace":
            ok = self._conj_mask(query, filters)
            rows = np.nonzero(ok)[0]
            if len(rows) == 0:
                return []
            s = self._fvf(self._meta_col(field)[rows], factor,
                          modifier)
            order = np.lexsort((r.doc_ids[rows], -s))[:k]
            return [(int(r.doc_ids[rows[i]]), float(s[i]))
                    for i in order]
        if boost_mode != "multiply":
            raise ValueError("boost_mode must be 'replace' or "
                             "'multiply'")
        hits = self.search(query, k=len(r.doc_ids), filters=filters)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        base = np.array([s for _, s in hits], dtype=np.float64)
        rows = np.searchsorted(r.doc_ids, ids)
        s = base * self._fvf(self._meta_col(field)[rows], factor,
                             modifier)
        order = np.lexsort((ids, -s))[:k]
        return [(int(ids[i]), float(s[i])) for i in order]

    def facet_filters(self, query: str, buckets: dict[str, dict],
                      filters: dict | None = None
                      ) -> list[tuple[str, int]]:
        """OpenSearch ``filters`` aggregation: one named bucket per
        sub-query node (any DSL leaf/bool tree), counting the docs of
        the outer match set that also match the node. Returns
        (name, count) in name order; per-shard counts sum exactly
        (docs partition by shard)."""
        base = self._conj_mask(query, filters)
        out = []
        for name in sorted(buckets):
            _, m = self._eval_bool_tree(buckets[name])
            out.append((name, int(np.count_nonzero(base & m))))
        return out

    def facet_composite(self, query: str, sources: list[str],
                        size: int = 10, after: tuple | None = None,
                        filters: dict | None = None) -> list[dict]:
        """OpenSearch ``composite`` aggregation: buckets keyed by the
        tuple of one or more kept metadata columns, in ascending
        composite-key order, paginated with an exclusive ``after``
        cursor. THE scale-shaped aggregation — unlike ``terms`` it
        never ships the full bucket set: each page is the next
        ``size`` buckets. The sharded merge stays exact because docs
        partition by shard and any key in the global first ``size``
        is preceded by < size keys in EVERY shard, so each shard's
        first-``size``-after-cursor page contains its full count for
        every global-page key. Returns
        ``[{"key": {field: value}, "doc_count": n}]``."""
        r = self.r
        ok = self._conj_mask(query, filters)
        rows = np.nonzero(ok)[0]
        if len(rows) == 0 or size <= 0:
            return []
        cols = [self._meta_col(f)[rows] for f in sources]
        order = np.lexsort(tuple(reversed(cols)))
        cs = [c[order] for c in cols]
        n = len(order)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in cs:
            change[1:] |= c[1:] != c[:-1]
        starts = np.nonzero(change)[0]
        counts = np.diff(np.append(starts, n))

        def py(v):
            return v.item() if hasattr(v, "item") else v

        lo = 0
        if after is not None:          # O(log B) cursor seek, not a scan
            import bisect
            lo = bisect.bisect_right(
                starts, tuple(after),
                key=lambda st: tuple(py(col[st]) for col in cs))
        out: list[dict] = []
        for st, c in zip(starts[lo:lo + size], counts[lo:lo + size]):
            out.append({"key": dict(zip(
                sources, (py(col[st]) for col in cs))),
                "doc_count": int(c)})
        return out

    def suggest(self, term: str, field: str | None = None,
                max_edits: int = 2, prefix_length: int = 1
                ) -> tuple[str, int, int] | None:
        """'Did you mean' — OpenSearch term-suggester semantics: among
        vocabulary terms within Damerau-Levenshtein distance
        ``max_edits`` that share the first ``prefix_length`` chars
        (and are not the input itself), pick by (distance asc, df
        desc, term asc). Returns (suggestion, df, distance), or None
        when nothing qualifies. An in-vocabulary input still gets a
        suggestion (its best neighbour), like the real suggester."""
        from baram_ray.index.segment import _dl_distance
        r = self.r
        fld = field or r.fields[0]
        pre = term[:prefix_length]
        best = None
        for t in r._term_list(fld):
            if t == term or not t.startswith(pre):
                continue
            if abs(len(t) - len(term)) > max_edits:
                continue
            d = _dl_distance(term, t, max_edits)
            if d > max_edits:
                continue
            key = (d, -r.df(fld, t), t)
            if best is None or key < best[0]:
                best = (key, t)
        if best is None:
            return None
        (d, ndf, t) = best[0]
        return (t, -ndf, d)

    def _conj_mask(self, query: str, filters: dict | None) -> np.ndarray:
        """Boolean mask over the reader's doc rows for the conjunctive
        match set of ``query`` (every token must match; empty query =
        whole live corpus) intersected with metadata ``filters`` — the
        shared match-set predicate behind every aggregation path."""
        from baram_ray.tokenizer import tokenize
        r = self.r
        ok = (r.live.copy() if r.live is not None
              else np.ones(len(r.doc_ids), dtype=bool))
        for t in dict.fromkeys(tokenize(query or "")):
            _, m = self._clause_eval(t, None)
            ok &= m
        mask = r.filter_mask(filters)
        if mask is not None:
            ok &= mask
        return ok

    def _meta_col(self, field: str) -> np.ndarray:
        r = self.r
        if field not in r.doc_meta:
            from baram_ray.errors import UnknownFilterColumn
            raise UnknownFilterColumn(field)
        return r.doc_meta[field]

    def facets(self, query: str, facet_fields: list[str],
               filters: dict | None = None
               ) -> list[tuple[str, object, int]]:
        """OpenSearch-style terms aggregation alongside a conjunctive
        query: per facet field (a kept metadata column), the count of
        EVERY matching doc per value — the full match set, not top-k.
        Empty query aggregates the whole live corpus. Returns (facet,
        value, count) rows sorted count desc / value asc within each
        facet. Shard-local counts sum exactly (docs partition by
        shard), so the sharded form merges by addition."""
        r = self.r
        ok = self._conj_mask(query, filters)
        out: list[tuple[str, object, int]] = []
        for f in facet_fields:
            if f not in r.doc_meta:
                from baram_ray.errors import UnknownFilterColumn
                raise UnknownFilterColumn(f)
            uniq, cnts = np.unique(r.doc_meta[f][ok], return_counts=True)
            order = np.lexsort((uniq, -cnts))
            out.extend((f, uniq[i], int(cnts[i])) for i in order)
        return out

    # ------------------------------------------------------------------ #
    def facet_histogram(self, query: str, field: str, interval: float,
                        filters: dict | None = None
                        ) -> list[tuple[float, int]]:
        """OpenSearch histogram aggregation over the full conjunctive
        match set: counts per fixed-width bucket of a kept NUMERIC
        metadata column; bucket key = floor(value / interval) *
        interval (OpenSearch's convention). Returns (bucket_lo, count)
        sorted by bucket. Shard-local histograms sum exactly."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        keys = np.floor(vals.astype(np.float64) / interval) * interval
        uniq, cnts = np.unique(keys, return_counts=True)
        return [(float(u), int(c)) for u, c in zip(uniq, cnts)]

    def facet_stats(self, query: str, field: str,
                    filters: dict | None = None) -> dict:
        """OpenSearch ``stats`` aggregation over the full conjunctive
        match set: count / min / max / sum / avg of a kept NUMERIC
        metadata column. Empty match set mirrors OpenSearch: count=0,
        sum=0, min/max/avg None. Integer columns sum in exact Python
        ints, so per-shard partial sums merge bit-identically; avg is
        the single IEEE division sum/count (same op on the sharded
        merge). Float columns sum per shard — merged sums can differ
        from a single reader by summation-order ULPs."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        n = int(len(vals))
        if n == 0:
            return {"count": 0, "min": None, "max": None,
                    "sum": 0, "avg": None}
        if np.issubdtype(vals.dtype, np.integer):
            tot = int(np.sum(vals, dtype=np.int64))  # exact to 2^63
            lo, hi = int(vals.min()), int(vals.max())
        else:
            tot = float(np.sum(vals.astype(np.float64)))
            lo, hi = float(vals.min()), float(vals.max())
        return {"count": n, "min": lo, "max": hi, "sum": tot,
                "avg": tot / n}

    def facet_ranges(self, query: str, field: str, ranges: list[dict],
                     filters: dict | None = None
                     ) -> list[tuple[float | None, float | None, int]]:
        """OpenSearch ``range`` aggregation: per half-open bucket
        [from, to) of a kept numeric column, the count of matching
        docs. ``ranges`` entries carry optional "from"/"to" (absent =
        open end, OpenSearch convention). Returns (from, to, count)
        in the given bucket order; per-shard counts sum exactly."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)] \
            .astype(np.float64)
        out = []
        for rg in ranges:
            lo, hi = rg.get("from"), rg.get("to")
            m = np.ones(len(vals), dtype=bool)
            if lo is not None:
                m &= vals >= float(lo)
            if hi is not None:
                m &= vals < float(hi)
            out.append((None if lo is None else float(lo),
                        None if hi is None else float(hi),
                        int(np.count_nonzero(m))))
        return out

    def facet_cardinality(self, query: str, field: str,
                          filters: dict | None = None) -> int:
        """EXACT distinct-count of a kept metadata column over the
        full conjunctive match set (OpenSearch ``cardinality`` is an
        HLL approximation; per-shard exact value sets union exactly,
        so this engine serves the exact number — documented stronger
        semantics, same API shape)."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        return int(len(np.unique(vals)))

    def search_script_score(self, node: dict, script: str,
                            k: int = 10,
                            filters: dict | None = None,
                            min_score: float | None = None
                            ) -> list[tuple[int, float]]:
        """OpenSearch ``script_score``: replace every match's score
        with ``script`` evaluated over ``params._score`` (the BM25
        score) and ``params.<col>`` (kept metadata columns). The AST
        evaluator runs ONCE over numpy columns — every allowed
        operator is element-wise, so scoring is one vectorized pass
        (no per-doc loop). Matching comes from the nested-bool
        evaluator, so any shard-safe query tree works; per-shard
        scores are shard-complete (global idf) → sharded merge is
        rank-identical."""
        from baram_ray.query.dsl import (_eval_script,
                                         script_param_names)
        r = self.r
        base, matched = self._eval_bool_tree(node)
        params = {}
        for name in script_param_names(script):
            if name == "_score":
                params[name] = base
            else:
                params[name] = self._meta_col(name)
        vals = np.asarray(_eval_script(script, params,
                                       arith_only=True),
                          dtype=np.float64)
        if vals.ndim == 0:                 # constant script
            vals = np.full(len(matched), float(vals))
        mask = r.filter_mask(filters)
        if mask is not None:
            matched = matched & mask
        rows = np.nonzero(matched)[0]
        if not len(rows) or k <= 0:
            return []
        sv = vals[rows]
        if min_score is not None:
            keep = sv >= min_score
            rows, sv = rows[keep], sv[keep]
        order = np.lexsort((r.doc_ids[rows], -sv))[:k]
        return [(int(r.doc_ids[rows[i]]), float(sv[i]))
                for i in order]

    def match_ids(self, values, filters: dict | None = None
                  ) -> np.ndarray:
        """OpenSearch ``ids`` query: the subset of ``values`` present
        (and live) in the index, sorted ascending."""
        r = self.r
        vals = np.unique(np.asarray(list(values), dtype=np.int64))
        rows = np.nonzero(np.isin(r.doc_ids, vals))[0]
        mask = r.filter_mask(filters)
        if mask is not None and len(rows):
            rows = rows[mask[rows]]
        return np.sort(r.doc_ids[rows]) if len(rows) else \
            np.empty(0, dtype=np.int64)

    def facet_missing_count(self, query: str, field: str,
                            filters: dict | None = None) -> int:
        """OpenSearch ``missing`` aggregation: matching docs whose
        kept column is null (NaN float / None object); per-shard
        counts sum exactly."""
        import pandas as pd
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        return int(np.count_nonzero(~np.asarray(pd.notna(vals))))

    def stats_partials(self, query: str, field: str,
                       filters: dict | None = None) -> dict:
        """Exact mergeable partials for ``extended_stats`` on an
        integer column: (count, min, max, sum, sum_of_squares) as
        Python ints (sum-of-squares accumulates in object ints — no
        int64 overflow at any corpus size). Variance/std derive at
        the very end with ONE fixed float expression, so per-shard
        partials merge bit-identically."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        if len(vals) == 0:
            return {"count": 0}
        v = vals.astype(np.int64)
        sq = int(np.dot(v.astype(object), v.astype(object)))
        return {"count": int(len(v)), "min": int(v.min()),
                "max": int(v.max()), "sum": int(v.sum()),
                "sum_of_squares": sq}

    @staticmethod
    def extended_stats_from_partials(p: dict) -> dict:
        """The OpenSearch extended_stats fields from exact partials —
        variance = (ssq - sum²/n)/n with the float ops in this exact
        order (the SQL oracle spells the same expression)."""
        if p.get("count", 0) == 0:
            return {"count": 0}
        n = p["count"]
        avg = p["sum"] / n
        var = (float(p["sum_of_squares"])
               - float(p["sum"]) * float(p["sum"]) / n) / n
        return {"count": n, "min": p["min"], "max": p["max"],
                "sum": p["sum"], "avg": avg,
                "sum_of_squares": p["sum_of_squares"],
                "variance": var, "std_deviation": math.sqrt(var)}

    def weighted_avg_partials(self, query: str, value_field: str,
                              weight_field: str,
                              filters: dict | None = None) -> dict:
        """Exact (Σ v·w, Σ w) int partials for ``weighted_avg`` —
        per-shard sums add exactly; the single division happens once
        at the end."""
        ok = self._conj_mask(query, filters)
        v = self._meta_col(value_field)[ok].astype(np.int64)
        w = self._meta_col(weight_field)[ok].astype(np.int64)
        return {"vw": int(np.dot(v.astype(object), w.astype(object))),
                "w": int(w.sum())}

    def top_docs_meta(self, query: str, fields: list[str],
                      shard_size: int = 100,
                      filters: dict | None = None):
        """Kept-metadata rows of the top ``shard_size`` BM25 matches —
        the OpenSearch ``sampler`` aggregation's document sample
        (per-SHARD top-N by score, the published contract). The
        sample is bounded by construction, so sub-aggs over it are
        driver-side pandas on ≤ shard_size × n_shards rows."""
        import pandas as pd
        hits = self.search(query, k=int(shard_size), filters=filters)
        ids = np.asarray([d for d, _ in hits], dtype=np.int64)
        # map doc_ids → rows exactly (doc_ids need not be sorted)
        order = np.argsort(self.r.doc_ids, kind="stable")
        pos = order[np.searchsorted(self.r.doc_ids[order], ids)]
        out = {"doc_id": ids,
               "_score": np.asarray([s for _, s in hits])}
        for f in fields:
            out[f] = self._meta_col(f)[pos]
        return pd.DataFrame(out)

    def percentile_rank_partials(self, query: str, field: str,
                                 values: list[float],
                                 filters: dict | None = None
                                 ) -> dict:
        """Exact partials for ``percentile_ranks``: per probe value,
        the count of matching column values ≤ it, plus the total —
        ints that sum across shards; the single 100·c/n division
        happens once at the end."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        v = np.sort(vals.astype(np.float64))
        return {"n": int(len(v)),
                "le": [int(np.searchsorted(v, float(x), side="right"))
                       for x in values]}

    def facet_multi_terms(self, query: str, fields: list[str],
                          filters: dict | None = None
                          ) -> list[tuple[tuple, int]]:
        """OpenSearch ``multi_terms``: buckets keyed by the TUPLE of
        kept columns, ordered (count desc, key tuple asc). Vectorized
        composite-code bincount (factorize each field, combine codes);
        per-shard counts sum exactly."""
        ok = self._conj_mask(query, filters)
        cols = [self._meta_col(f)[ok] for f in fields]
        if not len(cols[0]):
            return []
        codes, uniqs = [], []
        for c in cols:
            u, inv = np.unique(c, return_inverse=True)
            uniqs.append(u)
            codes.append(inv.astype(np.int64))
        key = np.zeros(len(codes[0]), dtype=np.int64)
        for u, inv in zip(uniqs, codes):
            key = key * len(u) + inv
        ku, cnts = np.unique(key, return_counts=True)
        out = []
        for kk, c in zip(ku, cnts):
            tup = []
            rem = int(kk)
            for u in reversed(uniqs):
                tup.append(u[rem % len(u)])
                rem //= len(u)
            out.append((tuple(reversed(tup)), int(c)))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    def cardinality_registers(self, query: str, field: str,
                              filters: dict | None = None,
                              p: int = 12) -> np.ndarray:
        """HLL register array (2^p uint8) of a kept column over the
        match set — the mergeable representation behind the
        approximate ``cardinality`` agg (OpenSearch's
        precision_threshold path). Registers from disjoint doc shards
        merge by elementwise max BIT-IDENTICALLY to a single pass
        (fixed blake2b hash)."""
        from baram_ray.sketches import hll_partial
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        return hll_partial(vals, p)

    def facet_cardinality_approx(self, query: str, field: str,
                                 filters: dict | None = None,
                                 p: int = 12) -> int:
        """Approximate distinct count via HLL (~1.04/√2^p rel. error,
        linear-counting-corrected at small n)."""
        from baram_ray.sketches import hll_estimate
        return int(round(hll_estimate(
            self.cardinality_registers(query, field, filters, p))))

    def facet_group_stats(self, query: str, by: str, field: str,
                          filters: dict | None = None
                          ) -> list[tuple[object, int, object, object,
                                          object, float]]:
        """OpenSearch terms aggregation with a nested ``stats``
        sub-aggregation: per distinct value of ``by`` in the full
        conjunctive match set, (value, count, min, max, sum, avg) of
        the numeric ``field``. Vectorized one-pass group stats
        (unique-inverse + bincount / extremum scatter, no Python
        group loop); int sums exact → per-shard partials merge
        bit-identically. Sorted count desc, value asc (the facets
        bucket order)."""
        ok = self._conj_mask(query, filters)
        byv = self._meta_col(by)[ok]
        vals = self._meta_col(field)[ok]
        if len(byv) == 0:
            return []
        uniq, inv = np.unique(byv, return_inverse=True)
        g = len(uniq)
        cnts = np.bincount(inv, minlength=g)
        is_int = np.issubdtype(vals.dtype, np.integer)
        if is_int:
            sums = np.zeros(g, dtype=np.int64)
            np.add.at(sums, inv, vals.astype(np.int64))
        else:
            sums = np.bincount(inv, weights=vals.astype(np.float64),
                               minlength=g)
        v64 = vals.astype(np.int64 if is_int else np.float64)
        lo = np.full(g, v64.max())
        hi = np.full(g, v64.min())
        np.minimum.at(lo, inv, v64)
        np.maximum.at(hi, inv, v64)
        cast = int if is_int else float
        rows = [(uniq[i], int(cnts[i]), cast(lo[i]), cast(hi[i]),
                 cast(sums[i]), cast(sums[i]) / int(cnts[i]))
                for i in range(g)]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows

    # calendar truncation for date_histogram: epoch-day value → the
    # bucket's first epoch day (vectorized numpy datetime64 math; weeks
    # start Monday like OpenSearch/ISO — 1970-01-01 was a Thursday, so
    # days-since-Monday = (epoch_day + 3) mod 7)
    @staticmethod
    def _calendar_trunc(days: np.ndarray, interval: str) -> np.ndarray:
        d64 = days.astype("datetime64[D]")
        if interval == "day":
            return days
        if interval == "week":
            return days - (days + 3) % 7
        if interval == "month":
            return d64.astype("datetime64[M]").astype(
                "datetime64[D]").astype(np.int64)
        if interval == "quarter":
            m = d64.astype("datetime64[M]").astype(np.int64)
            return ((m // 3) * 3).astype("datetime64[M]").astype(
                "datetime64[D]").astype(np.int64)
        if interval == "year":
            return d64.astype("datetime64[Y]").astype(
                "datetime64[D]").astype(np.int64)
        raise ValueError(f"unknown calendar_interval {interval!r} — "
                         "use day/week/month/quarter/year")

    def facet_date_histogram(self, query: str, field: str,
                             calendar_interval: str | None = None,
                             fixed_interval: int | None = None,
                             filters: dict | None = None
                             ) -> list[tuple[str, int, int]]:
        """OpenSearch ``date_histogram`` aggregation over the full
        conjunctive match set. ``field`` holds dates as EPOCH DAYS (a
        numeric kept metadata column — OpenSearch likewise buckets on
        the underlying epoch number). ``calendar_interval`` ∈
        day/week/month/quarter/year does real calendar truncation
        (weeks start Monday, ISO/OpenSearch convention);
        ``fixed_interval`` is a day count (floor to multiples, the
        histogram rule). Returns (key_as_string ISO date, epoch_day
        key, count) sorted by key; per-shard bucket counts sum
        exactly."""
        if (calendar_interval is None) == (fixed_interval is None):
            raise ValueError("exactly one of calendar_interval / "
                             "fixed_interval is required")
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        days = vals.astype(np.int64)
        if calendar_interval is not None:
            keys = self._calendar_trunc(days, calendar_interval)
        else:
            n = int(fixed_interval)
            keys = (days // n) * n
        uniq, cnts = np.unique(keys, return_counts=True)
        iso = uniq.astype("datetime64[D]").astype(str)
        return [(str(s), int(u), int(c))
                for s, u, c in zip(iso, uniq, cnts)]

    def facet_date_group_stats(self, query: str, field: str,
                               value_field: str,
                               calendar_interval: str | None = None,
                               fixed_interval: int | None = None,
                               filters: dict | None = None
                               ) -> list[tuple]:
        """``date_histogram`` with a nested metric (``stats``-family)
        sub-aggregation over ``value_field`` — the OpenSearch shape the
        pipeline aggregations (derivative / cumulative_sum / moving_fn)
        consume. Same bucketing rule as :meth:`facet_date_histogram`;
        same vectorized group-stats kernel as
        :meth:`facet_group_stats` (int sums exact → per-shard partials
        merge bit-identically, avg is ONE sum/count division). Returns
        (iso, epoch_day key, count, min, max, sum, avg) sorted by
        key."""
        if (calendar_interval is None) == (fixed_interval is None):
            raise ValueError("exactly one of calendar_interval / "
                             "fixed_interval is required")
        ok = self._conj_mask(query, filters)
        days = self._meta_col(field)[ok].astype(np.int64)
        vals = self._meta_col(value_field)[ok]
        if len(days) == 0:
            return []
        if calendar_interval is not None:
            keys = self._calendar_trunc(days, calendar_interval)
        else:
            n = int(fixed_interval)
            keys = (days // n) * n
        uniq, inv = np.unique(keys, return_inverse=True)
        g = len(uniq)
        cnts = np.bincount(inv, minlength=g)
        is_int = np.issubdtype(vals.dtype, np.integer)
        if is_int:
            sums = np.zeros(g, dtype=np.int64)
            np.add.at(sums, inv, vals.astype(np.int64))
        else:
            sums = np.bincount(inv, weights=vals.astype(np.float64),
                               minlength=g)
        v64 = vals.astype(np.int64 if is_int else np.float64)
        lo = np.full(g, v64.max())
        hi = np.full(g, v64.min())
        np.minimum.at(lo, inv, v64)
        np.maximum.at(hi, inv, v64)
        cast = int if is_int else float
        iso = uniq.astype("datetime64[D]").astype(str)
        return [(str(iso[i]), int(uniq[i]), int(cnts[i]),
                 cast(lo[i]), cast(hi[i]), cast(sums[i]),
                 cast(sums[i]) / int(cnts[i]))
                for i in range(g)]

    def facet_value_counts(self, query: str, field: str,
                           filters: dict | None = None
                           ) -> list[tuple[float, int]]:
        """(value, count) pairs of a numeric kept column over the full
        conjunctive match set — the mergeable exact representation
        behind ``facet_percentiles`` (per-shard pair lists merge by
        addition; exact when the column's distinct-value universe is
        bounded, which metadata columns are. The unbounded-stream
        analogue is the KLL sketch in ``baram_ray.sketches``)."""
        vals = self._meta_col(field)[self._conj_mask(query, filters)]
        uniq, cnts = np.unique(vals, return_counts=True)
        return [(v, int(c)) for v, c in zip(uniq.tolist(),
                                            cnts.tolist())]

    @staticmethod
    def percentiles_from_counts(pairs: list[tuple[float, int]],
                                percents: list[float]) -> dict:
        """EXACT percentiles from merged (value, count) pairs — the
        classic nearest-rank convention: the element at 0-based index
        ``ceil(p·n) − 1`` of the sorted multiset (empirically verified
        identical to DuckDB ``quantile_disc`` across sizes and
        percents). OpenSearch serves a TDigest approximation; this
        engine serves the exact number (documented stronger semantics,
        same API shape)."""
        out: dict[str, float | None] = {}
        if not pairs:
            return {str(p): None for p in percents}
        pairs = sorted(pairs)
        cum = np.cumsum([c for _, c in pairs])
        n = int(cum[-1])
        for p in percents:
            idx = max(0, min(n - 1,
                             int(math.ceil((p / 100.0) * n)) - 1))
            pos = int(np.searchsorted(cum, idx + 1, side="left"))
            out[str(p)] = float(pairs[pos][0])
        return out

    def facet_percentiles(self, query: str, field: str,
                          percents: list[float] | None = None,
                          filters: dict | None = None) -> dict:
        """OpenSearch ``percentiles`` aggregation (exact — see
        ``percentiles_from_counts``). Default percents are
        OpenSearch's [1, 5, 25, 50, 75, 95, 99]."""
        percents = percents or [1, 5, 25, 50, 75, 95, 99]
        return self.percentiles_from_counts(
            self.facet_value_counts(query, field, filters=filters),
            percents)

    def facet_top_hits(self, query: str, by: str, sort_field: str,
                       size: int = 3, ascending: bool = False,
                       filters: dict | None = None
                       ) -> list[dict]:
        """OpenSearch ``terms`` bucket agg with a ``top_hits``
        sub-aggregation sorted by a kept metadata column: per distinct
        ``by`` value in the full conjunctive match set, the top
        ``size`` docs by (sort_field desc/asc, doc_id asc). One
        vectorized lexsort, no per-bucket loop. Buckets keep the
        facets order (count desc, key asc); per-shard bucket top
        lists re-sort + truncate exactly (docs partition by shard)."""
        r = self.r
        ok = self._conj_mask(query, filters)
        rows = np.nonzero(ok)[0]
        if len(rows) == 0:
            return []
        byv = self._meta_col(by)[rows]
        ids = r.doc_ids[rows]
        # "doc_id" (the DSL's default top_hits sort) is the identity
        # column, not a kept meta column
        sv = ids if sort_field == "doc_id" else \
            self._meta_col(sort_field)[rows]
        skey = sv if ascending else -sv
        order = np.lexsort((ids, skey, byv))
        byv, sv, ids = byv[order], sv[order], ids[order]
        uniq, starts, cnts = np.unique(byv, return_index=True,
                                       return_counts=True)
        def py(v):
            return v.item() if hasattr(v, "item") else v
        buckets = []
        for u, st, c in zip(uniq, starts, cnts):
            hits = [{"doc_id": int(ids[i]), sort_field: py(sv[i])}
                    for i in range(st, st + min(int(c), size))]
            buckets.append({"key": py(u), "doc_count": int(c),
                            "hits": hits})
        buckets.sort(key=lambda b: (-b["doc_count"], str(b["key"])))
        return buckets

    def facet_significant_text(self, query: str, size: int = 10,
                               min_doc_count: int = 3,
                               field: str | None = None,
                               filters: dict | None = None
                               ) -> list[tuple[str, int, int, float]]:
        """OpenSearch ``significant_text`` aggregation: vocabulary
        terms unusually frequent in the match set (foreground) vs the
        whole index (background), scored with the default JLH:
        ``(fg% − bg%) × (fg% / bg%)`` where fg% = fg_df/fg_total and
        bg% = bg_df/bg_total. fg/bg doc counts are postings-exact
        (index-native — no doc re-tokenization); df is build-time df
        like Lucene (tombstones don't decrement). ``min_doc_count``
        prefilters on GLOBAL df (so per-shard passes keep the same
        candidate set and their fg/bg counts sum exactly). Returns
        (term, fg_df, bg_df, score) sorted (score desc, term asc),
        top ``size``; only terms with fg% > bg% qualify (OpenSearch
        drops non-positive scores)."""
        r = self.r
        fld = field or r.fields[0]
        ok = self._conj_mask(query, filters)
        fg_total = int(np.count_nonzero(ok))
        bg_total = int(r.n_docs)
        if fg_total == 0:
            return []
        rows = []
        for t in r._term_list(fld):
            pl = r.postings.get((fld, t))
            if pl is None:
                continue
            bg_df = r.df_global(fld, t, pl)
            if bg_df < min_doc_count:
                continue
            ranks, _ = pl.decode_all()
            fg_df = int(np.count_nonzero(ok[ranks - r.rank_base]))
            if fg_df < min_doc_count:
                continue
            rows.append((t, fg_df, bg_df))
        scored = self.score_significant(rows, fg_total, bg_total)
        return scored[:size]

    @staticmethod
    def score_significant(rows: list[tuple[str, int, int]],
                          fg_total: int, bg_total: int
                          ) -> list[tuple[str, int, int, float]]:
        """JLH scoring of (term, fg_df, bg_df) rows — shared by the
        single-reader and scatter-gather paths so merged counts score
        bit-identically. Fixed IEEE expression order:
        fg% = fg/fgN, bg% = bg/bgN, score = (fg% − bg%) × (fg% / bg%)."""
        out = []
        for t, fg, bg in rows:
            fgp = fg / fg_total
            bgp = bg / bg_total
            if fgp <= bgp:
                continue
            out.append((t, fg, bg, (fgp - bgp) * (fgp / bgp)))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out

    def search_sorted(self, query: str, sort_by: str, k: int = 10,
                      ascending: bool = True,
                      filters: dict | None = None,
                      after: tuple | None = None
                      ) -> list[tuple[int, object]]:
        """Metadata-sorted retrieval (OpenSearch ``sort`` clause instead
        of _score): the conjunctive match set ordered by a kept
        metadata column (doc_id-asc tie-break), top-k. Returns
        (doc_id, sort_value) rows.

        ``after=(sort_value, doc_id)``: resume strictly after that
        composite cursor — OpenSearch sort+search_after pagination.
        The (value, doc_id) key is unique per doc, so page-concat
        equals a one-shot scan (tested)."""
        r = self.r
        if sort_by not in r.doc_meta:
            from baram_ray.errors import UnknownFilterColumn
            raise UnknownFilterColumn(sort_by)
        ok = self._conj_mask(query, filters)
        if after is not None:
            v_a, d_a = after
            col = r.doc_meta[sort_by]
            later = (col > v_a) if ascending else (col < v_a)
            ok &= later | ((col == v_a) & (r.doc_ids > int(d_a)))
        rows = np.nonzero(ok)[0]
        if len(rows) == 0 or k <= 0:
            return []
        df = pd.DataFrame({"v": r.doc_meta[sort_by][rows],
                           "d": r.doc_ids[rows]})
        df = df.sort_values(["v", "d"], ascending=[ascending, True],
                            kind="stable").head(k)
        return [(int(d), v) for d, v in zip(df["d"], df["v"])]

    def search_collapse_sorted(self, query: str, collapse_field: str,
                               sort_by: str, k: int = 10,
                               ascending: bool = False,
                               filters: dict | None = None
                               ) -> list[tuple[int, object, object]]:
        """Collapse with a metadata SORT instead of _score (OpenSearch
        ``collapse`` + ``sort``): over the conjunctive match set, each
        ``collapse_field`` group is represented by its extreme
        ``sort_by`` row (doc_id-asc ties) and groups rank by that
        (value, doc_id) key — "the best/latest document per source".
        Exact and vectorized over the match set (no growth loop: the
        sort key is resident metadata). Returns (doc_id, sort_value,
        group_value) rows."""
        from baram_ray.tokenizer import tokenize
        r = self.r
        for col in (collapse_field, sort_by):
            if col not in r.doc_meta:
                from baram_ray.errors import UnknownFilterColumn
                raise UnknownFilterColumn(col)
        ok = (r.live.copy() if r.live is not None
              else np.ones(len(r.doc_ids), dtype=bool))
        for t in dict.fromkeys(tokenize(query or "")):
            _, m = self._clause_eval(t, None)
            ok &= m
        mask = r.filter_mask(filters)
        if mask is not None:
            ok &= mask
        rows = np.nonzero(ok)[0]
        if len(rows) == 0 or k <= 0:
            return []
        df = pd.DataFrame({"g": r.doc_meta[collapse_field][rows],
                           "v": r.doc_meta[sort_by][rows],
                           "d": r.doc_ids[rows]})
        df = df.sort_values(["v", "d"], ascending=[ascending, True],
                            kind="stable")
        df = df.drop_duplicates("g", keep="first").head(k)
        return [(int(d), v, g) for d, v, g in zip(df["d"], df["v"],
                                                  df["g"])]

    def _exp_arrays(self, exps) -> tuple[np.ndarray, np.ndarray]:
        """(score array, matched mask) over local rows for a bool-should
        of expanded ``(field, term, weight)`` term queries — the shared
        scoring kernel behind prefix / fuzzy / wildcard queries (and
        their compound-clause forms): per-expansion BM25 × weight summed
        per doc."""
        r = self.r
        n = r.n_docs
        acc = np.zeros(len(r.doc_ids), dtype=np.float64)
        matched = np.zeros(len(r.doc_ids), dtype=bool)
        for f, t, w in exps:
            if w <= 0.0:
                continue
            pl = r.postings[(f, t)]
            df = r.df_global(f, t, pl)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            rows, tfs = pl.decode_all()
            if r.rank_base:
                rows = rows - r.rank_base
            dl = r.dl[f][rows]
            avg = r.avgdl[f] or 1.0
            tff = tfs.astype(np.float64)
            s = (w * idf) * tff / (
                tff + self.k1 * ((1.0 - self.b) + (self.b * dl) / avg))
            np.add.at(acc, rows, s)
            matched[rows] = True
        return acc, matched

    def _score_expansions(self, exps, k: int,
                          filters: dict | None,
                          min_score: float | None
                          ) -> list[tuple[int, float]]:
        """Top-k of ``_exp_arrays``: sorted (score desc, doc_id asc),
        filters then min_score applied."""
        r = self.r
        acc, matched = self._exp_arrays(exps)
        mask = r.filter_mask(filters)
        if mask is not None:
            matched &= mask
        cand = np.nonzero(matched)[0]
        if len(cand) == 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -acc[cand]))
        out = [(int(r.doc_ids[i]), float(acc[i])) for i in cand[order[:k]]]
        if min_score is not None:
            out = [(d, s) for d, s in out if s >= min_score]
        return out

    def search_qs(self, q: str, k: int = 10, **kw):
        """Query-STRING search (the reference REST API's ``q=``
        surface, extended with simple_query_string conveniences):
        parse ``q`` and route to the one exact engine op it denotes —
        see ``baram_ray.query.qparse``. Parsed execution is
        bit-identical to the explicit API call (tested)."""
        from baram_ray.query.qparse import execute
        return execute(self, q, k=k, **kw)

    def search_collapse(self, query: str, collapse_field: str,
                        k: int = 10, *,
                        boosts: dict[str, float] | None = None,
                        filters: dict | None = None,
                        algorithm: str = "auto"
                        ) -> list[tuple[int, float, object]]:
        """OpenSearch-style field collapsing: top-k hits with at most
        ONE hit per value of a kept metadata column — each group is
        represented by its best (score desc, doc_id asc) hit. The
        reference's diversity knob for result pages dominated by one
        source (OpenSearch ``collapse``; its backend feature set,
        ``src/embedding/mod.rs:240-245``).

        EXACT, not best-effort: the inner top-k' grows geometrically
        until k distinct groups are collected or the candidate list is
        exhausted. Because hits arrive globally sorted and collapse
        keeps first-per-group, a prefix that yields k groups is the
        true collapsed top-k (later hits score no higher than the
        accepted ones). Returns (doc_id, score, group_value) rows."""
        r = self.r
        if collapse_field not in r.doc_meta:
            from baram_ray.errors import UnknownFilterColumn
            raise UnknownFilterColumn(collapse_field)
        if k <= 0:
            return []
        kk = max(k, 10)
        while True:
            hits = self.search(query, k=kk, boosts=boosts,
                               filters=filters, algorithm=algorithm)
            out: list[tuple[int, float, object]] = []
            seen: set = set()
            for d, s in hits:
                key = r.doc_meta[collapse_field][r.doc_index[d]]
                if key in seen:
                    continue
                seen.add(key)
                out.append((d, s, key))
                if len(out) == k:
                    return out
            if len(hits) < kk:          # candidates exhausted: every
                return out              # group already surfaced
            kk *= 4

    def search_prefix(self, prefix: str, k: int = 10,
                      max_expansions: int = 50,
                      boosts: dict[str, float] | None = None,
                      filters: dict | None = None,
                      min_score: float | None = None
                      ) -> list[tuple[int, float]]:
        """Prefix query: expand to the first ``max_expansions`` matching
        terms per field in term-dict order (OpenSearch prefix-expansion
        semantics), then score as a bool-should of the expanded term
        queries (BM25 sum). Sorted (score desc, doc_id asc)."""
        from baram_ray.tokenizer import tokenize
        toks = tokenize(prefix)
        if not toks or k <= 0:
            return []
        pre = toks[0]           # analyzed prefix (lowercased identifier)
        r = self.r
        boosts = boosts or {}
        exps = ((f, t, float(boosts.get(f, 1.0)))
                for f in r.fields
                for t in r.terms_with_prefix(f, pre, max_expansions))
        return self._score_expansions(exps, k, filters, min_score)

    def search_wildcard(self, pattern: str, k: int = 10,
                        max_expansions: int = 50,
                        boosts: dict[str, float] | None = None,
                        filters: dict | None = None,
                        min_score: float | None = None
                        ) -> list[tuple[int, float]]:
        """Wildcard query (Lucene/OpenSearch WildcardQuery surface, the
        ``query_string`` wildcard path of the reference's search body —
        ``src/embedding/mod.rs:470-539``): ``*`` matches any run, ``?``
        exactly one char. The pattern is NOT analyzed (wildcard queries
        bypass the analyzer) — only lowercased to match the lowercase
        term dict; it expands in term-dict order capped at
        ``max_expansions`` per field, scored as a bool-should of the
        expanded term queries (BM25 sum — consistent with this engine's
        scoring-mode prefix queries). Sorted (score desc, doc_id asc)."""
        pat = pattern.strip().lower()
        if not pat or k <= 0:
            return []
        r = self.r
        boosts = boosts or {}
        exps = ((f, t, float(boosts.get(f, 1.0)))
                for f in r.fields
                for t in r.terms_wildcard(f, pat, max_expansions))
        return self._score_expansions(exps, k, filters, min_score)

    def search_regexp(self, pattern: str, k: int = 10,
                      max_expansions: int = 50,
                      boosts: dict[str, float] | None = None,
                      filters: dict | None = None,
                      min_score: float | None = None
                      ) -> list[tuple[int, float]]:
        """Regexp query (Lucene/OpenSearch RegexpQuery, the last
        expansion-kind of the reference backend's query_string surface):
        the ANCHORED pattern expands against each field's term dict in
        term-dictionary order capped at ``max_expansions``, scored as a
        bool-should of the expanded term queries (BM25 sum — consistent
        with this engine's scoring-mode prefix/wildcard queries). The
        pattern is not analyzed, only lowercased to match the lowercase
        term dict. Sorted (score desc, doc_id asc)."""
        pat = pattern.strip().lower()
        if not pat or k <= 0:
            return []
        r = self.r
        boosts = boosts or {}
        exps = ((f, t, float(boosts.get(f, 1.0)))
                for f in r.fields
                for t in r.terms_regexp(f, pat, max_expansions))
        return self._score_expansions(exps, k, filters, min_score)

    def match_regexp_docs(self, pattern: str,
                          max_expansions: int = 100_000) -> np.ndarray:
        """All doc_ids containing any term fully matching ``pattern``
        in any field (retrieval, no scoring; sorted asc)."""
        pat = pattern.strip().lower()
        if not pat:
            return np.empty(0, dtype=np.int64)
        r = self.r
        return self._match_expanded_docs(
            (f, t) for f in r.fields
            for t in r.terms_regexp(f, pat, max_expansions))

    # ------------------------------------------------------------------ #
    def search_fuzzy(self, query: str, k: int = 10,
                     max_edits: int | None = None,
                     prefix_length: int = 0,
                     max_expansions: int = 50,
                     boosts: dict[str, float] | None = None,
                     filters: dict | None = None,
                     min_score: float | None = None
                     ) -> list[tuple[int, float]]:
        """Fuzzy match: each analyzed query term expands to index terms
        within Damerau-Levenshtein distance ``max_edits`` (None = AUTO:
        0/1/2 by term length — OpenSearch fuzziness AUTO), each expansion
        scored as a term query downweighted by Lucene's fuzzy boost
        ``1 − d/len(query_term)``; bool-should over all expansions.
        Sorted (score desc, doc_id asc)."""
        from baram_ray.index.segment import _dl_distance
        from baram_ray.tokenizer import tokenize
        terms = sorted(set(tokenize(query)))
        if not terms or k <= 0:
            return []
        r = self.r
        boosts = boosts or {}

        def exps():
            for f in r.fields:
                w = float(boosts.get(f, 1.0))
                for qt in terms:
                    me = max_edits
                    if me is None:
                        me = 0 if len(qt) < 3 else (1 if len(qt) <= 5 else 2)
                    for e in r.terms_fuzzy(f, qt, me, prefix_length,
                                           max_expansions):
                        d = _dl_distance(qt, e, me)
                        fw = 1.0 if d == 0 else max(0.0, 1.0 - d / len(qt))
                        yield f, e, w * fw

        return self._score_expansions(exps(), k, filters, min_score)

    def match_fuzzy_docs(self, term: str, max_edits: int | None = None,
                         prefix_length: int = 0,
                         max_expansions: int = 10_000) -> np.ndarray:
        """All doc_ids containing any term within ``max_edits`` of
        ``term`` in any field (retrieval, no scoring; sorted asc)."""
        from baram_ray.tokenizer import tokenize
        toks = tokenize(term)
        if not toks:
            return np.empty(0, dtype=np.int64)
        qt = toks[0]
        r = self.r
        return self._match_expanded_docs(
            (f, e) for f in r.fields
            for e in r.terms_fuzzy(f, qt, max_edits, prefix_length,
                                   max_expansions))

    def _match_expanded_docs(self, per_field_terms) -> np.ndarray:
        """doc_ids containing ANY of the expanded terms (retrieval, no
        scoring; live-masked; sorted ascending). ``per_field_terms``
        yields ``(field, term)``."""
        r = self.r
        rows_all: set[int] = set()
        for f, t in per_field_terms:
            rows, _ = r.postings[(f, t)].decode_all()
            if r.rank_base:
                rows = rows - r.rank_base
            rows_all.update(rows.tolist())
        if not rows_all:
            return np.empty(0, dtype=np.int64)
        rows = np.array(sorted(rows_all), dtype=np.int64)
        if r.live is not None:
            rows = rows[r.live[rows]]
        return np.sort(r.doc_ids[rows])

    def match_prefix_docs(self, prefix: str,
                          max_expansions: int = 10_000) -> np.ndarray:
        """All doc_ids containing ANY term with the given prefix in any
        field (retrieval, no scoring; sorted ascending)."""
        from baram_ray.tokenizer import tokenize
        toks = tokenize(prefix)
        if not toks:
            return np.empty(0, dtype=np.int64)
        pre = toks[0]
        r = self.r
        return self._match_expanded_docs(
            (f, t) for f in r.fields
            for t in r.terms_with_prefix(f, pre, max_expansions))

    def match_wildcard_docs(self, pattern: str,
                            max_expansions: int = 10_000) -> np.ndarray:
        """All doc_ids containing ANY term matching the glob ``pattern``
        (``*``/``?``, unanalyzed, lowercased) in any field (retrieval,
        no scoring; sorted ascending)."""
        pat = pattern.strip().lower()
        if not pat:
            return np.empty(0, dtype=np.int64)
        r = self.r
        return self._match_expanded_docs(
            (f, t) for f in r.fields
            for t in r.terms_wildcard(f, pat, max_expansions))

    def live_doc_ids(self) -> np.ndarray:
        """Match-all retrieval excluding deleted docs (sorted asc)."""
        return self.r.live_doc_ids()

    def paginate(self, query: str, page_size: int = 500, **kw):
        """Yield successive result pages until exhausted — the reference's
        search_after scroll loop (``src/clustering/engine.rs:152-280``,
        batch 500)."""
        after = None
        while True:
            page = self.search(query, k=page_size, after=after, **kw)
            if not page:
                return
            yield page
            after = (page[-1][1], page[-1][0])       # (score, doc_id) cursor

    # ------------------------------------------------------------------ #
    # Phrase queries (positional index required: IndexConfig(positions=True))
    # ------------------------------------------------------------------ #
    def _phrase_field(self, field: str, qterms: dict[str, list[int]],
                      weight: float):
        """Conjunctive next_geq traversal + position verification for one
        field. Returns ({rank: phrase_freq}, idf_sum) — empty when any
        phrase term is absent from the field.

        A doc matches when some base offset aligns EVERY query occurrence:
        base ∈ ⋂_{(t, qp)} (positions(t) − qp); phrase_freq = |⋂|. Blocks
        are skipped with the same galloping ``next_geq`` the scored path
        uses, driven by the rarest term.
        """
        r = self.r
        n = r.n_docs
        iters: list[_TermIter] = []
        qpos: list[list[int]] = []
        idf_sum = 0.0
        for t, qps in qterms.items():
            pl = r.postings.get((field, t))
            if pl is None:
                return {}, 0.0
            df = r.df_global(field, t, pl)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            idf_sum += idf
            iters.append(_TermIter(field, t, pl, idf, weight,
                                   self.k1, self.b))
            qpos.append(qps)
        # head-term phrases: every term's postings (and positions) get
        # touched anyway, so a fully-vectorized set-intersection beats the
        # per-candidate Python loop; selective phrases keep the skip loop
        # (rarest-term driver + block next_geq decodes only needed blocks)
        if min(it.pl.df for it in iters) > PHRASE_VEC_MIN_DF:
            return self._phrase_vec(iters, qpos), idf_sum
        lead = min(range(len(iters)), key=lambda i: iters[i].pl.df)
        others = [it for i, it in enumerate(iters) if i != lead]
        DONE = _TermIter.DONE
        freqs: dict[int, int] = {}
        d = iters[lead].doc
        while d < DONE:
            target = d
            aligned = True
            for it in others:
                nd = it.next_geq(target)
                if nd != target:
                    aligned, target = False, nd
                    break
            if not aligned:
                if target >= DONE:
                    break
                d = iters[lead].next_geq(target)
                continue
            offs = None
            for it, qps in zip(iters, qpos):
                p = it.positions_at()
                term_offs = None
                for qp in qps:     # every occurrence of t in the phrase
                    shifted = p - qp
                    term_offs = shifted if term_offs is None else \
                        np.intersect1d(term_offs, shifted)
                    if len(term_offs) == 0:
                        break
                offs = term_offs if offs is None else \
                    np.intersect1d(offs, term_offs)
                if len(offs) == 0:
                    break
            if offs is not None and len(offs):
                freqs[d] = len(np.unique(offs))
            d = iters[lead].advance()
        return freqs, idf_sum

    @staticmethod
    def _phrase_vec(iters: list[_TermIter],
                    qpos: list[list[int]]) -> dict[int, int]:
        """Vectorized exhaustive phrase match: every (term, query-offset)
        pair becomes a sorted unique key array ``(rank << 32) | (pos − qp
        + SHIFT)``; the phrase's base-offset set per doc is the
        intersection of all key arrays, and phrase freq = surviving keys
        per rank. O(total postings+positions) numpy, no per-doc loop."""
        SHIFT = max(qp for qps in qpos for qp in qps) + 1   # keys ≥ 0
        keys = None
        for it, qps in zip(iters, qpos):
            ranks, tfs = it.pl.decode_all()
            pos = it.pl.decode_pos_all()
            rep = np.repeat(ranks, tfs)
            for qp in qps:
                kk = np.unique((rep << np.int64(32))
                               | (pos - np.int64(qp) + np.int64(SHIFT)))
                keys = kk if keys is None else \
                    keys[np.isin(keys, kk, assume_unique=True)]
                if keys is not None and len(keys) == 0:
                    return {}
        if keys is None or not len(keys):
            return {}
        ranks = keys >> np.int64(32)
        uniq, counts = np.unique(ranks, return_counts=True)
        return dict(zip(uniq.tolist(), counts.tolist()))

    @staticmethod
    def _sloppy_freq(pos_lists: list[np.ndarray], slop: int) -> float:
        """Ordered span-near sloppy frequency (Lucene SpanNearQuery
        in_order=True semantics with SloppyPhraseScorer weighting):
        enumerate the MINIMAL windows [s, e] containing an ordered chain
        p_1 < p_2 < … < p_m with p_j a position of query token j, via
        the classic two-pass sweep: greedy forward chain from each start
        fixes the minimal end e, then a FULL backward pass from e
        re-maximizes every chain position (p_j = max L_j strictly below
        p_{j+1}), yielding the maximal start s for that end. Successive
        windows have strictly increasing s AND e, so the emitted set is
        exactly the containment-minimal span set. Each window with
        ``slack = (e - s) - (m - 1) ≤ slop`` contributes
        ``1 / (1 + slack)``; slack 0 windows are exact-phrase matches.
        """
        L0 = pos_lists[0]
        m = len(pos_lists)
        freq = 0.0
        i0 = 0
        while i0 < len(L0):
            b = int(L0[i0])
            ok = True
            for j in range(1, m):
                Lj = pos_lists[j]
                t = int(np.searchsorted(Lj, b, side="right"))
                if t == len(Lj):
                    ok = False
                    break
                b = int(Lj[t])
            if not ok:
                break
            # backward pass: from the fixed end, pull every earlier chain
            # position as late as possible (the forward chain witnesses
            # that each searchsorted finds an element, so t >= 0)
            hi = b
            for j in range(m - 2, -1, -1):
                Lj = pos_lists[j]
                t = int(np.searchsorted(Lj, hi, side="left")) - 1
                hi = int(Lj[t])
            start = hi
            slack = (b - start) - (m - 1)
            if slack <= slop:
                freq += 1.0 / (1.0 + slack)
            i0 = int(np.searchsorted(L0, start, side="right"))
        return freq

    def _phrase_field_slop(self, field: str, qseq: list[str],
                           slop: int):
        """Conjunctive traversal + sloppy window verification for one
        field: docs containing ALL phrase terms get their per-query-token
        position arrays run through ``_sloppy_freq``. Returns
        ({rank: sloppy_freq}, idf_sum) like ``_phrase_field``."""
        r = self.r
        n = r.n_docs
        uniq = list(dict.fromkeys(qseq))
        its: dict[str, _TermIter] = {}
        idf_sum = 0.0
        for t in uniq:
            pl = r.postings.get((field, t))
            if pl is None:
                return {}, 0.0
            df = r.df_global(field, t, pl)
            idf_sum += math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            its[t] = _TermIter(field, t, pl, 0.0, 1.0, self.k1, self.b)
        iters = list(its.values())
        lead = min(range(len(iters)), key=lambda i: iters[i].pl.df)
        others = [it for i, it in enumerate(iters) if i != lead]
        DONE = _TermIter.DONE
        freqs: dict[int, float] = {}
        d = iters[lead].doc
        while d < DONE:
            target = d
            ok = True
            for it in others:
                nd = it.next_geq(target)
                if nd != target:
                    ok, target = False, nd
                    break
            if not ok:
                if target >= DONE:
                    break
                d = iters[lead].next_geq(target)
                continue
            pos_by_term = {t: it.positions_at() for t, it in its.items()}
            fr = self._sloppy_freq([pos_by_term[t] for t in qseq], slop)
            if fr > 0.0:
                freqs[d] = fr
            d = iters[lead].advance()
        return freqs, idf_sum

    def _phrase_freqs(self, query: str,
                      fields: list[str] | None = None,
                      boosts: dict[str, float] | None = None,
                      slop: int = 0):
        """Per-field phrase match maps: [(field, weight, idf_sum,
        {rank: freq})]. Shared by scoring and retrieval."""
        from baram_ray.tokenizer import analyze_phrase
        if not self.r.has_positions:
            raise ValueError(
                "phrase queries need a positional index — build with "
                "IndexConfig(positions=True)")
        toks = analyze_phrase(query)
        if not toks:
            return []
        qterms: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            qterms.setdefault(t, []).append(i)
        boosts = boosts or {}
        out = []
        for f in (fields or self.r.fields):
            w = float(boosts.get(f, 1.0))
            if slop > 0:
                freqs, idf_sum = self._phrase_field_slop(f, toks, slop)
            else:
                freqs, idf_sum = self._phrase_field(f, qterms, w)
            if freqs:
                out.append((f, w, idf_sum, freqs))
        return out

    def search_phrase(self, query: str, k: int = 10,
                      fields: list[str] | None = None,
                      boosts: dict[str, float] | None = None,
                      filters: dict | None = None,
                      min_score: float | None = None,
                      slop: int = 0
                      ) -> list[tuple[int, float]]:
        """Exact-phrase top-k: the phrase scores as ONE composite term per
        field (Lucene PhraseQuery semantics: idf = Σ term idfs, tf =
        phrase frequency), bool-should across fields like ``search``.
        ``slop > 0`` switches to ordered span-near matching with sloppy
        weighting (tf = Σ 1/(1+slack) over minimal windows with slack ≤
        slop — ``_sloppy_freq``); slop=0 is the exact path. Sorted
        (score desc, doc_id asc)."""
        per_field = self._phrase_freqs(query, fields, boosts, slop)
        if not per_field or k <= 0:
            return []
        r = self.r
        acc: dict[int, float] = {}
        for f, w, idf_sum, freqs in per_field:
            avg = r.avgdl[f] or 1.0
            dl = r.dl[f]
            for rank, fr in freqs.items():
                row = rank - r.rank_base
                s = w * idf_sum * fr / (
                    fr + self.k1 * (1.0 - self.b
                                    + (self.b * dl[row]) / avg))
                acc[rank] = acc.get(rank, 0.0) + s
        mask = r.filter_mask(filters)
        hits = []
        for rank, s in acc.items():
            row = rank - r.rank_base
            if mask is not None and not mask[row]:
                continue
            if min_score is not None and s < min_score:
                continue
            hits.append((int(r.doc_ids[row]), float(s)))
        hits.sort(key=lambda ds: (-ds[1], ds[0]))
        return hits[:k]

    def match_phrase_docs(self, query: str,
                          fields: list[str] | None = None,
                          filters: dict | None = None,
                          slop: int = 0) -> np.ndarray:
        """All doc_ids containing the phrase (exactly, or within ``slop``
        ordered-window slack) in ANY of ``fields`` — retrieval without
        scoring (sorted ascending)."""
        per_field = self._phrase_freqs(query, fields, slop=slop)
        r = self.r
        mask = r.filter_mask(filters)
        ranks: set[int] = set()
        for _, _, _, freqs in per_field:
            ranks.update(freqs)
        rows = np.array(sorted(rk - r.rank_base for rk in ranks),
                        dtype=np.int64)
        if mask is not None and len(rows):
            rows = rows[mask[rows]]
        return np.sort(r.doc_ids[rows]) if len(rows) else \
            np.empty(0, dtype=np.int64)

    # ------------------------------------------------------------------ #
    # Span queries — the Lucene SpanQuery family the reference gets from
    # OpenSearch (span_near / span_first / span_not). Ordered span_near
    # IS the sloppy-phrase machinery above; unordered span_near uses the
    # k-list minimal-window sweep; span_first / span_not are per-doc
    # position predicates on a single term's positions.

    @staticmethod
    def _unordered_span_freq(pos_lists: list[np.ndarray],
                             slop: int) -> float:
        """Unordered span-near sloppy frequency (Lucene SpanNearQuery
        in_order=False): the classic smallest-range sweep over the k
        sorted position lists — at each step the current window is
        [min, max] of the per-list heads and the list holding the min
        advances. The sweep visits every containment-minimal covering
        window (standard k-list range-cover result), so slop
        satisfiability is exact; each visited window with
        ``slack = (max - min) - (m - 1) ≤ slop`` contributes
        ``1 / (1 + slack)`` (the SloppyPhrase weighting)."""
        m = len(pos_lists)
        idx = [0] * m
        lens = [len(p) for p in pos_lists]
        freq = 0.0
        while True:
            vals = [int(pos_lists[j][idx[j]]) for j in range(m)]
            s, e = min(vals), max(vals)
            slack = (e - s) - (m - 1)
            if slack <= slop:
                freq += 1.0 / (1.0 + slack)
            j = vals.index(s)
            idx[j] += 1
            if idx[j] == lens[j]:
                return freq

    def _span_field(self, field: str, terms: list[str], slop: int,
                    in_order: bool):
        """Conjunctive traversal + span window verification for one
        field — the ``_phrase_field_slop`` skeleton with the window
        checker swapped: ordered spans reuse ``_sloppy_freq``,
        unordered spans use ``_unordered_span_freq``. Returns
        ({rank: span_freq}, idf_sum)."""
        if len(set(terms)) != len(terms):
            raise ValueError("span_near clauses must be distinct "
                             "terms — repeated-term spans are not "
                             "supported")
        r = self.r
        n = r.n_docs
        its: dict[str, _TermIter] = {}
        idf_sum = 0.0
        for t in terms:
            pl = r.postings.get((field, t))
            if pl is None:
                return {}, 0.0
            df = r.df_global(field, t, pl)
            idf_sum += math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            its[t] = _TermIter(field, t, pl, 0.0, 1.0, self.k1, self.b)
        iters = list(its.values())
        lead = min(range(len(iters)), key=lambda i: iters[i].pl.df)
        others = [it for i, it in enumerate(iters) if i != lead]
        DONE = _TermIter.DONE
        freqs: dict[int, float] = {}
        d = iters[lead].doc
        while d < DONE:
            target = d
            ok = True
            for it in others:
                nd = it.next_geq(target)
                if nd != target:
                    ok, target = False, nd
                    break
            if not ok:
                if target >= DONE:
                    break
                d = iters[lead].next_geq(target)
                continue
            pls = [its[t].positions_at() for t in terms]
            fr = (self._sloppy_freq(pls, slop) if in_order
                  else self._unordered_span_freq(pls, slop))
            if fr > 0.0:
                freqs[d] = fr
            d = iters[lead].advance()
        return freqs, idf_sum

    def _span_freqs(self, terms: list[str], slop: int, in_order: bool,
                    fields: list[str] | None = None):
        from baram_ray.tokenizer import analyze_phrase
        if not self.r.has_positions:
            raise ValueError(
                "span queries need a positional index — build with "
                "IndexConfig(positions=True)")
        toks = [t for raw in terms for t in analyze_phrase(raw)]
        if not toks:
            return []
        out = []
        for f in (fields or self.r.fields):
            freqs, idf_sum = self._span_field(f, toks, slop, in_order)
            if freqs:
                out.append((f, 1.0, idf_sum, freqs))
        return out

    def search_span_near(self, terms: list[str], k: int = 10,
                         slop: int = 0, in_order: bool = True,
                         fields: list[str] | None = None,
                         filters: dict | None = None,
                         min_score: float | None = None
                         ) -> list[tuple[int, float]]:
        """span_near top-k: docs where the terms co-occur within a
        window of slack ≤ ``slop`` (ordered chain when ``in_order``,
        any permutation otherwise), scored as ONE composite term
        (idf = Σ term idfs, tf = span frequency — the PhraseQuery
        scoring shape). Sorted (score desc, doc_id asc)."""
        per_field = self._span_freqs(terms, slop, in_order, fields)
        return self._score_composite(per_field, k, filters, min_score)

    def match_span_near_docs(self, terms: list[str], slop: int = 0,
                             in_order: bool = True,
                             fields: list[str] | None = None,
                             filters: dict | None = None) -> np.ndarray:
        """All doc_ids with a qualifying span window (retrieval without
        scoring, sorted ascending)."""
        per_field = self._span_freqs(terms, slop, in_order, fields)
        r = self.r
        mask = r.filter_mask(filters)
        ranks: set[int] = set()
        for _, _, _, freqs in per_field:
            ranks.update(freqs)
        rows = np.array(sorted(rk - r.rank_base for rk in ranks),
                        dtype=np.int64)
        if mask is not None and len(rows):
            rows = rows[mask[rows]]
        return np.sort(r.doc_ids[rows]) if len(rows) else \
            np.empty(0, dtype=np.int64)

    def _term_positions_rows(self, term: str,
                             fields: list[str] | None = None):
        """(field → {rank: positions}) for one analyzed term."""
        from baram_ray.tokenizer import analyze_phrase
        if not self.r.has_positions:
            raise ValueError(
                "span queries need a positional index — build with "
                "IndexConfig(positions=True)")
        toks = analyze_phrase(term)
        if len(toks) != 1:
            raise ValueError(f"span term must analyze to one token, "
                             f"got {toks!r} from {term!r}")
        t = toks[0]
        out = {}
        for f in (fields or self.r.fields):
            pl = self.r.postings.get((f, t))
            if pl is None:
                continue
            it = _TermIter(f, t, pl, 0.0, 1.0, self.k1, self.b)
            per: dict[int, np.ndarray] = {}
            d = it.doc
            while d < _TermIter.DONE:
                per[d] = it.positions_at()
                d = it.advance()
            out[f] = per
        return out

    def match_span_first_docs(self, term: str, end: int,
                              fields: list[str] | None = None,
                              filters: dict | None = None
                              ) -> np.ndarray:
        """span_first: docs whose FIRST occurrence of ``term`` lies
        within the first ``end`` token positions (Lucene SpanFirstQuery
        — span end ≤ end, i.e. 0-based position < end). Sorted doc_ids."""
        ranks: set[int] = set()
        for per in self._term_positions_rows(term, fields).values():
            for rk, pos in per.items():
                if len(pos) and int(pos[0]) < end:
                    ranks.add(rk)
        return self._ranks_to_docs(ranks, filters)

    def match_span_not_docs(self, include: str, exclude: str,
                            dist: int = 0,
                            fields: list[str] | None = None,
                            filters: dict | None = None) -> np.ndarray:
        """span_not: docs with an occurrence of ``include`` that has NO
        occurrence of ``exclude`` within ``dist`` token positions
        (Lucene SpanNotQuery with pre = post = dist). ``dist=0`` means
        the same position — useful with ``dist ≥ 1`` for proximity
        exclusion. Sorted doc_ids."""
        inc = self._term_positions_rows(include, fields)
        exc = self._term_positions_rows(exclude, fields)
        ranks: set[int] = set()
        for f, per in inc.items():
            eper = exc.get(f, {})
            for rk, pos in per.items():
                ep = eper.get(rk)
                if ep is None or not len(ep):
                    ranks.add(rk)
                    continue
                # an include position survives iff no exclude position
                # within [p - dist, p + dist]
                lo = np.searchsorted(ep, pos - dist, side="left")
                hi = np.searchsorted(ep, pos + dist, side="right")
                if bool(np.any(lo == hi)):
                    ranks.add(rk)
        return self._ranks_to_docs(ranks, filters)

    def _ranks_to_docs(self, ranks: set[int],
                       filters: dict | None) -> np.ndarray:
        r = self.r
        mask = r.filter_mask(filters)
        rows = np.array(sorted(rk - r.rank_base for rk in ranks),
                        dtype=np.int64)
        if mask is not None and len(rows):
            rows = rows[mask[rows]]
        return np.sort(r.doc_ids[rows]) if len(rows) else \
            np.empty(0, dtype=np.int64)

    def _score_composite(self, per_field, k: int,
                         filters: dict | None,
                         min_score: float | None
                         ) -> list[tuple[int, float]]:
        """Composite-term BM25 scoring over (field, w, idf_sum, freqs)
        tuples — the search_phrase scoring tail, shared by spans."""
        if not per_field or k <= 0:
            return []
        r = self.r
        acc: dict[int, float] = {}
        for f, w, idf_sum, freqs in per_field:
            avg = r.avgdl[f] or 1.0
            dl = r.dl[f]
            for rank, fr in freqs.items():
                row = rank - r.rank_base
                s = w * idf_sum * fr / (
                    fr + self.k1 * (1.0 - self.b
                                    + (self.b * dl[row]) / avg))
                acc[rank] = acc.get(rank, 0.0) + s
        mask = r.filter_mask(filters)
        hits = []
        for rank, s in acc.items():
            row = rank - r.rank_base
            if mask is not None and not mask[row]:
                continue
            if min_score is not None and s < min_score:
                continue
            hits.append((int(r.doc_ids[row]), float(s)))
        hits.sort(key=lambda ds: (-ds[1], ds[0]))
        return hits[:k]

    # ------------------------------------------------------------------ #
    # SynonymQuery — Lucene's blended-term scoring (what OpenSearch's
    # synonym/synonym_graph analyzer filters produce at query time):
    # every member of a synonym group shares ONE statistic — df is the
    # distinct-doc count of the member UNION, tf(doc) is the SUM of
    # member tfs — and the group scores as a single BM25 term. Groups
    # combine like match-query tokens (operator or/and).

    def _synonym_group(self, field: str, terms: list[str]):
        """Merged (rows, tf_sum) over the member postings of one group
        (rows are reader-local row indices; per-shard unions are
        disjoint across shards, so blended df sums exactly)."""
        r = self.r
        rks, tfs = [], []
        for t in terms:
            pl = r.postings.get((field, t))
            if pl is None:
                continue
            for bi in range(pl.n_blocks):
                d, f = pl.decode(bi)
                rks.append(np.asarray(d, dtype=np.int64))
                tfs.append(np.asarray(f, dtype=np.float64))
        if not rks:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        rk = np.concatenate(rks)
        tf = np.concatenate(tfs)
        uniq, inv = np.unique(rk, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(summed, inv, tf)
        return uniq, summed

    @staticmethod
    def _analyze_groups(groups) -> list[list[str]]:
        from baram_ray.tokenizer import analyze_phrase
        out = []
        for g in groups:
            toks = []
            for raw in g:
                t = analyze_phrase(raw)
                if len(t) != 1:
                    raise ValueError(
                        f"synonym member must analyze to one token, "
                        f"got {t!r} from {raw!r}")
                toks.append(t[0])
            out.append(list(dict.fromkeys(toks)))
        return out

    def synonym_group_df(self, groups: list[list[str]],
                         fields: list[str] | None = None
                         ) -> dict[tuple[str, int], int]:
        """Shard-LOCAL blended df per (field, group index) — summed
        across shards by ShardedEngine (doc shards are disjoint) to
        recover the global union size."""
        groups = self._analyze_groups(groups)
        out = {}
        for f in (fields or self.r.fields):
            for gi, g in enumerate(groups):
                rows, _ = self._synonym_group(f, g)
                out[(f, gi)] = int(len(rows))
        return out

    def search_synonym(self, groups: list[list[str]], k: int = 10,
                       operator: str = "or",
                       fields: list[str] | None = None,
                       filters: dict | None = None,
                       min_score: float | None = None,
                       df_override: dict | None = None
                       ) -> list[tuple[int, float]]:
        """Blended synonym-group top-k. ``operator="and"`` keeps only
        docs matching EVERY group (the match-query operator rule).
        ``df_override`` carries the cross-shard blended dfs so sharded
        scoring is score-identical to one reader."""
        groups = self._analyze_groups(groups)
        if not groups or k <= 0:
            return []
        r = self.r
        n = r.n_docs
        all_rows, all_scores = [], []
        ngroups_hit = {}
        for f in (fields or self.r.fields):
            avg = r.avgdl[f] or 1.0
            dl = r.dl[f]
            for gi, g in enumerate(groups):
                uniq, tf = self._synonym_group(f, g)
                if not len(uniq):
                    continue
                df = (df_override or {}).get((f, gi), len(uniq))
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                rows = uniq - r.rank_base
                denom = tf + self.k1 * (1.0 - self.b
                                        + self.b * dl[rows] / avg)
                all_rows.append(rows)
                all_scores.append(idf * tf / denom)
                for rk in rows:
                    key = int(rk)
                    ngroups_hit.setdefault(key, set()).add(gi)
        if not all_rows:
            return []
        rows = np.concatenate(all_rows)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(rows, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, scores)
        mask = r.filter_mask(filters)
        hits = []
        need = len(groups) if operator == "and" else 1
        for i, row in enumerate(uniq):
            if mask is not None and not mask[row]:
                continue
            if len(ngroups_hit.get(int(row), ())) < need:
                continue
            s = float(acc[i])
            if min_score is not None and s < min_score:
                continue
            hits.append((int(r.doc_ids[row]), s))
        hits.sort(key=lambda ds: (-ds[1], ds[0]))
        return hits[:k]

    def match_synonym_docs(self, groups: list[list[str]],
                           operator: str = "or",
                           fields: list[str] | None = None,
                           filters: dict | None = None) -> np.ndarray:
        """Doc-set retrieval for synonym groups (sorted ascending)."""
        groups = self._analyze_groups(groups)
        r = self.r
        per_doc: dict[int, set] = {}
        for f in (fields or self.r.fields):
            for gi, g in enumerate(groups):
                ranks_g, _ = self._synonym_group(f, g)
                for rk in ranks_g:
                    per_doc.setdefault(int(rk), set()).add(gi)
        need = len(groups) if operator == "and" else 1
        ranks = {rk for rk, gs in per_doc.items() if len(gs) >= need}
        return self._ranks_to_docs(ranks, filters)

    # ------------------------------------------------------------------ #
    # match_phrase_prefix — Lucene MultiPhrasePrefixQuery: an analyzed
    # phrase whose LAST position accepts any term-dict expansion of a
    # prefix (autocomplete-as-you-type search). Alignment semantics are
    # the multi-phrase rule: a base offset matches when every fixed
    # query occurrence aligns AND any expansion aligns at the last
    # slot. Scoring treats the phrase as one composite term (same shape
    # as search_phrase): idf = Σ idf(fixed terms) + idf(df_union) where
    # df_union is the distinct-doc count of the expansion UNION (the
    # well-defined analogue of a single term's df — Lucene's own
    # MultiPhraseQuery sums every expansion's idf, which grows with
    # max_expansions; the union df is expansion-count-stable), tf = the
    # aligned-offset count.
    # ------------------------------------------------------------------ #
    def _phrase_prefix_field(self, field: str, toks: list[str],
                             mx: int) -> tuple[dict[int, int], float]:
        """({rank: freq}, idf_sum) for one field — the _phrase_vec key
        intersection with a UNIONED last slot."""
        r = self.r
        n = r.n_docs
        pre = toks[-1]
        exps = r.terms_with_prefix(field, pre, mx)
        if not exps:
            return {}, 0.0
        qterms: dict[str, list[int]] = {}
        for i, t in enumerate(toks[:-1]):
            qterms.setdefault(t, []).append(i)
        idf_sum = 0.0
        SHIFT = np.int64(len(toks))
        keys = None
        for t, qps in qterms.items():
            pl = r.postings.get((field, t))
            if pl is None:
                return {}, 0.0
            df = r.df_global(field, t, pl)
            idf_sum += math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            ranks, tfs = pl.decode_all()
            pos = pl.decode_pos_all()
            rep = np.repeat(ranks, tfs)
            for qp in qps:
                kk = np.unique((rep << np.int64(32))
                               | (pos - np.int64(qp) + SHIFT))
                keys = kk if keys is None else \
                    keys[np.isin(keys, kk, assume_unique=True)]
                if len(keys) == 0:
                    return {}, 0.0
        # last slot: union of every expansion's shifted key set
        qp_last = np.int64(len(toks) - 1)
        parts = []
        union_ranks = []
        for e in exps:
            pl = r.postings[(field, e)]
            ranks, tfs = pl.decode_all()
            union_ranks.append(ranks)
            rep = np.repeat(ranks, tfs)
            parts.append((rep << np.int64(32))
                         | (pl.decode_pos_all() - qp_last + SHIFT))
        last_keys = np.unique(np.concatenate(parts))
        df_union = int(len(np.unique(np.concatenate(union_ranks))))
        idf_sum += math.log(1.0 + (n - df_union + 0.5)
                            / (df_union + 0.5))
        keys = last_keys if keys is None else \
            keys[np.isin(keys, last_keys, assume_unique=True)]
        if len(keys) == 0:
            return {}, 0.0
        ranks = keys >> np.int64(32)
        uniq, counts = np.unique(ranks, return_counts=True)
        return dict(zip(uniq.tolist(), counts.tolist())), idf_sum

    def _phrase_prefix_freqs(self, query: str,
                             fields: list[str] | None = None,
                             boosts: dict[str, float] | None = None,
                             max_expansions: int = 50):
        """Per-field multi-phrase match maps, shaped like
        ``_phrase_freqs``: [(field, weight, idf_sum, {rank: freq})]."""
        from baram_ray.tokenizer import analyze_phrase
        if not self.r.has_positions:
            raise ValueError(
                "match_phrase_prefix needs a positional index — build "
                "with IndexConfig(positions=True)")
        toks = analyze_phrase(query)
        if not toks:
            return []
        boosts = boosts or {}
        out = []
        for f in (fields or self.r.fields):
            freqs, idf_sum = self._phrase_prefix_field(
                f, toks, max_expansions)
            if freqs:
                out.append((f, float(boosts.get(f, 1.0)), idf_sum,
                            freqs))
        return out

    def search_phrase_prefix(self, query: str, k: int = 10,
                             max_expansions: int = 50,
                             fields: list[str] | None = None,
                             boosts: dict[str, float] | None = None,
                             filters: dict | None = None,
                             min_score: float | None = None
                             ) -> list[tuple[int, float]]:
        """match_phrase_prefix top-k (OpenSearch autocomplete query):
        scored like ``search_phrase`` with the multi-phrase freq and
        the union-df last-slot idf. Sorted (score desc, doc_id asc)."""
        per_field = self._phrase_prefix_freqs(query, fields, boosts,
                                              max_expansions)
        if not per_field or k <= 0:
            return []
        r = self.r
        acc: dict[int, float] = {}
        for f, w, idf_sum, freqs in per_field:
            avg = r.avgdl[f] or 1.0
            dl = r.dl[f]
            for rank, fr in freqs.items():
                row = rank - r.rank_base
                s = w * idf_sum * fr / (
                    fr + self.k1 * (1.0 - self.b
                                    + (self.b * dl[row]) / avg))
                acc[rank] = acc.get(rank, 0.0) + s
        mask = r.filter_mask(filters)
        hits = []
        for rank, s in acc.items():
            row = rank - r.rank_base
            if mask is not None and not mask[row]:
                continue
            if min_score is not None and s < min_score:
                continue
            hits.append((int(r.doc_ids[row]), float(s)))
        hits.sort(key=lambda ds: (-ds[1], ds[0]))
        return hits[:k]

    def match_phrase_prefix_docs(self, query: str,
                                 max_expansions: int = 50,
                                 fields: list[str] | None = None,
                                 filters: dict | None = None
                                 ) -> np.ndarray:
        """match_phrase_prefix RETRIEVAL (no scoring): sorted doc_ids
        with an aligned multi-phrase occurrence — the SQL-checkable
        core of ``search_phrase_prefix``."""
        per_field = self._phrase_prefix_freqs(
            query, fields, max_expansions=max_expansions)
        r = self.r
        mask = r.filter_mask(filters)
        ranks: set[int] = set()
        for _, _, _, freqs in per_field:
            ranks.update(freqs)
        rows = np.array(sorted(rk - r.rank_base for rk in ranks),
                        dtype=np.int64)
        if mask is not None and len(rows):
            rows = rows[mask[rows]]
        return np.sort(r.doc_ids[rows]) if len(rows) else \
            np.empty(0, dtype=np.int64)

    # ------------------------------------------------------------------ #
    def _daat(self, its: list[_TermIter], k: int, mask,
              after: tuple[float, int] | None = None) -> list:
        """Exhaustive vectorized scoring (the non-pruned exact path)."""
        r = self.r
        acc = np.zeros(len(r.doc_ids), dtype=np.float64)
        matched = np.zeros(len(r.doc_ids), dtype=bool)
        for it in its:                      # fixed (field, term) order → fp order
            rows, tfs = it.pl.decode_all()  # postings are GLOBAL ranks;
            if r.rank_base:                 # row = rank - base (sharded)
                rows = rows - r.rank_base
            dl = r.dl[it.field][rows]
            avg = r.avgdl[it.field] or 1.0
            tff = tfs.astype(np.float64)
            s = (it.weight * it.idf) * tff / (
                tff + self.k1 * ((1.0 - self.b) + (self.b * dl) / avg))
            np.add.at(acc, rows, s)
            matched[rows] = True
        if mask is not None:
            matched &= mask
        if after is not None:               # strictly after the cursor key
            s_a, d_a = after
            matched &= (acc < s_a) | ((acc == s_a) & (r.doc_ids > d_a))
        cand = np.nonzero(matched)[0]
        if len(cand) == 0:
            return []
        order = np.lexsort((r.doc_ids[cand], -acc[cand]))
        top = cand[order[:k]]
        return [(int(r.doc_ids[i]), float(acc[i])) for i in top]

    # ------------------------------------------------------------------ #
    def _wand(self, its: list[_TermIter], k: int, mask,
              after: tuple[float, int] | None = None) -> list:
        """Block-max WAND; rank-identical to _daat (ties: later ranks are
        larger in DAAT order, so strict `score > θ` acceptance is exact).
        Iterator positions are RANKS (rank order == doc_id order)."""
        r = self.r
        heap: list[tuple[float, int]] = []    # (score, -rank), worst on top
        DONE = _TermIter.DONE

        def theta() -> float:
            return heap[0][0] if len(heap) >= k else -1.0

        while True:
            live = [it for it in its if it.doc < DONE]
            if not live:
                break
            live.sort(key=lambda it: it.doc)
            # find pivot: smallest prefix whose ub sum exceeds θ
            t = theta()
            ub_sum = 0.0
            pivot = -1
            for i, it in enumerate(live):
                ub_sum += it.ub
                if ub_sum > t:
                    pivot = i
                    break
            if pivot == -1:
                break                          # no doc can beat θ
            pivot_doc = live[pivot].doc
            # include every iterator already positioned at pivot_doc: they
            # contribute to its score and to the shallow block-max bound
            while pivot + 1 < len(live) and live[pivot + 1].doc == pivot_doc:
                pivot += 1
            if live[0].doc == pivot_doc:
                # block-max check: shallow per-block bounds at pivot_doc
                bub = 0.0
                next_b = DONE
                for it in live[: pivot + 1]:
                    u, bmax = it.block_ub_at(pivot_doc)
                    bub += u
                    next_b = min(next_b, bmax)
                if bub <= t:
                    # whole aligned blocks can't beat θ → jump past them, but
                    # never past the next non-prefix iterator's doc (it may
                    # contribute to docs inside the skipped range)
                    target = next_b + 1
                    if pivot + 1 < len(live):
                        target = min(target, live[pivot + 1].doc)
                    target = max(target, pivot_doc + 1)
                    for it in live[: pivot + 1]:
                        if it.doc < target:
                            it.next_geq(target)
                    continue
                row = int(pivot_doc) - r.rank_base   # rank → local row
                allowed = mask is None or bool(mask[row])
                if allowed:
                    s = 0.0
                    for it in its:             # fixed (field, term) order
                        if it.doc == pivot_doc:
                            s += it.score_at(float(r.dl[it.field][row]),
                                             r.avgdl[it.field] or 1.0,
                                             self.k1, self.b)
                    if after is not None:
                        # search_after: only keys strictly after the cursor
                        # (θ pruning stays exact — it lower-bounds accepted
                        # scores, and rejected keys all sort before them)
                        s_a, d_a = after
                        did = int(r.doc_ids[row])
                        if not (s < s_a or (s == s_a and did > d_a)):
                            for it in live:
                                if it.doc == pivot_doc:
                                    it.advance()
                            continue
                    if s > theta():
                        if len(heap) >= k:
                            heapq.heapreplace(heap, (s, -pivot_doc))
                        else:
                            heapq.heappush(heap, (s, -pivot_doc))
                for it in live:
                    if it.doc == pivot_doc:
                        it.advance()
            else:
                # advance the largest-ub iterator still strictly before the
                # pivot doc (one at pivot_doc already would be a no-op → loop)
                cands = [i for i in range(pivot) if live[i].doc < pivot_doc]
                best = max(cands, key=lambda i: live[i].ub)
                live[best].next_geq(pivot_doc)

        out = [(-nd, s) for s, nd in heap]
        out.sort(key=lambda ds: (-ds[1], ds[0]))   # rank asc == doc_id asc
        return [(int(r.doc_ids[rank - r.rank_base]), s) for rank, s in out]


class ShardedEngine:
    """Scatter-gather over shard-range engines — the multi-node query
    architecture (each group holds only its shards' postings + doc rows;
    the reference delegates this to OpenSearch shard fan-out). Scores
    are computed with GLOBAL idf (termdict), so the merged top-k is
    rank- AND score-identical to a single full reader (tested).

    In-process form for tests/small indexes; the Ray form is one
    ``QueryActor(..., shard_range=...)`` pool per group feeding a
    groupby(query_id) merge (``pipelines.search.bm25_topk_sharded``).
    """

    def __init__(self, index_dir: str, n_groups: int = 2):
        import json as _json
        import os as _os
        with open(_os.path.join(index_dir, "meta.json")) as f:
            meta = _json.load(f)
        ns = max(1, int(meta.get("num_shards", 1)))
        n_groups = min(n_groups, ns)
        bounds = [round(i * ns / n_groups) for i in range(n_groups + 1)]
        self.engines = [QueryEngine(index_dir, shard_range=(lo, hi))
                        for lo, hi in zip(bounds, bounds[1:]) if hi > lo]

    def _scatter(self, method: str, k: int, args, kw) -> list:
        hits: list[tuple[int, float]] = []
        for eng in self.engines:            # scatter (actors in Ray form)
            hits.extend(getattr(eng, method)(*args, k=k, **kw))
        hits.sort(key=lambda ds: (-ds[1], ds[0]))
        return hits[:k]

    def search(self, query: str, k: int = 10, **kw) -> list:
        return self._scatter("search", k, (query,), kw)

    def search_phrase(self, query: str, k: int = 10, **kw) -> list:
        """Phrase scatter-gather: per-doc window verification is shard-
        local, idf is global (termdict) — merged top-k is rank- and
        score-identical to a single reader (tested)."""
        return self._scatter("search_phrase", k, (query,), kw)

    def search_span_near(self, terms: list, k: int = 10, **kw) -> list:
        """span_near scatter-gather: window verification is shard-
        local, idf is global (termdict) — same safety argument as
        search_phrase."""
        return self._scatter("search_span_near", k, (terms,), kw)

    def match_span_near_docs(self, terms: list, **kw) -> np.ndarray:
        """Docs-set scatter-gather: shards partition docs, so the
        sorted concatenation of per-shard matches is the global set."""
        parts = [eng.match_span_near_docs(terms, **kw)
                 for eng in self.engines]
        return np.sort(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)

    def search_synonym(self, groups: list, k: int = 10,
                       **kw) -> list:
        """Synonym scatter-gather: blended df is the SUM of per-shard
        union sizes (doc shards are disjoint), computed first and
        passed as ``df_override`` so every shard scores with the
        global statistic — score-identical to one reader (tested)."""
        dfs: dict = {}
        for eng in self.engines:
            for key, df in eng.synonym_group_df(
                    groups, kw.get("fields")).items():
                dfs[key] = dfs.get(key, 0) + df
        kw = dict(kw, df_override=dfs)
        return self._scatter("search_synonym", k, (groups,), kw)

    def match_synonym_docs(self, groups: list, **kw) -> np.ndarray:
        parts = [eng.match_synonym_docs(groups, **kw)
                 for eng in self.engines]
        return np.sort(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)

    def match_span_first_docs(self, term: str, end: int,
                              **kw) -> np.ndarray:
        parts = [eng.match_span_first_docs(term, end, **kw)
                 for eng in self.engines]
        return np.sort(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)

    def match_span_not_docs(self, include: str, exclude: str,
                            **kw) -> np.ndarray:
        parts = [eng.match_span_not_docs(include, exclude, **kw)
                 for eng in self.engines]
        return np.sort(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)

    def search_bool(self, k: int = 10, **kw) -> list:
        """Bool scatter-gather: each shard's must_not complement is its
        own doc range, so the union equals the global complement."""
        return self._scatter("search_bool", k, (), kw)

    def search_compound(self, k: int = 10, **kw) -> list:
        """Compound-bool scatter-gather for the shard-safe clause kinds
        (match + phrase: scoring is shard-local with global idf, and
        each shard's must_not complement is its own doc range). Prefix,
        wildcard and fuzzy clauses expand against a per-shard term dict
        with a per-shard cap — different shards could pick different
        expansions — so those kinds raise ``UnsupportedQuery`` here
        rather than return subtly different rankings (same boundary as
        ``search_qs``)."""
        from baram_ray.query.qparse import UnsupportedQuery
        for grp in ("must", "should", "must_not"):
            for c in (kw.get(grp) or []):
                if clause_kind(c) not in ("match", "phrase"):
                    raise UnsupportedQuery(
                        f"{clause_kind(c)} clause expansion is "
                        "per-shard-local — query a single reader for "
                        "this shape")
        return self._scatter("search_compound", k, (), kw)

    def search_dismax(self, queries: list, k: int = 10, **kw) -> list:
        """dis_max scatter-gather: per-doc scores are shard-complete
        (docs partition by shard; global idf via the termdict), so the
        merged top-k is rank- and score-identical to a single reader —
        for match/phrase clauses only (expansion kinds are per-shard
        term-dict-local, same boundary as ``search_compound``)."""
        from baram_ray.query.qparse import UnsupportedQuery
        for c in (queries or []):
            if clause_kind(c) not in ("match", "phrase"):
                raise UnsupportedQuery(
                    f"{clause_kind(c)} clause expansion is "
                    "per-shard-local — query a single reader for "
                    "this shape")
        return self._scatter("search_dismax", k, (queries,), kw)

    def search_constant_score(self, boost: float = 1.0, k: int = 10,
                              **kw) -> list:
        """Constant-score scatter-gather: per-shard match sets are
        disjoint; equal scores tie-break doc_id asc, so merging the
        per-shard first-k id lists and re-cutting k is exact."""
        hits = []
        for eng in self.engines:
            hits.extend(eng.search_constant_score(boost=boost, k=k,
                                                  **kw))
        hits.sort(key=lambda ds: ds[0])
        return hits[:k]

    def search_function_score(self, query: str = "", k: int = 10,
                              **kw) -> list:
        """function_score scatter-gather: fn is a pure per-doc value
        and BM25 uses global idf, so per-shard top-k lists merge
        score-identically to a single reader (both boost_modes)."""
        return self._scatter("search_function_score", k, (query,), kw)

    @staticmethod
    def _tree_shard_safe(node: dict) -> None:
        from baram_ray.query.qparse import UnsupportedQuery
        kind = next(iter(node))
        if kind == "bool":
            for g in ("must", "should", "must_not", "filter"):
                v = node["bool"].get(g) or []
                for c in (v if isinstance(v, list) else [v]):
                    ShardedEngine._tree_shard_safe(c)
            return
        if kind not in ("match", "match_phrase", "term", "terms",
                        "range", "exists", "match_all"):
            raise UnsupportedQuery(
                f"{kind} clause expansion is per-shard-local — query "
                "a single reader for this shape")

    def search_bool_tree(self, node: dict, k: int = 10, **kw) -> list:
        """Nested-bool scatter-gather: per-doc (score, matched) are
        shard-complete for match/phrase/term/range/match_all leaves
        (global idf; docs partition by shard), so per-shard top-k
        lists merge identically to a single reader. Expansion leaves
        refuse honestly (same boundary as ``search_compound``)."""
        self._tree_shard_safe(node)
        return self._scatter("search_bool_tree", k, (node,), kw)

    def search_boosting(self, positive: dict, negative: dict,
                        k: int = 10, **kw) -> list:
        """Boosting scatter-gather: per-doc scores and the negative
        mask are shard-complete (global idf; docs partition by
        shard), so per-shard top-k lists merge identically for
        shard-safe node trees."""
        self._tree_shard_safe(positive)
        self._tree_shard_safe(negative)
        return self._scatter("search_boosting", k,
                             (positive, negative), kw)

    def search_rescore(self, query: str, rescore_node: dict,
                       k: int = 10, window_size: int = 50,
                       query_weight: float = 1.0,
                       rescore_query_weight: float = 1.0,
                       filters: dict | None = None) -> list:
        """Rescore scatter-gather: the GLOBAL primary top-window merges
        exactly (global idf), then each window doc's secondary score
        comes from its owning shard (``rescore_scores``) — identical
        to a single reader because both halves are per-doc
        shard-complete. The window must be global: rescoring each
        shard's LOCAL window would promote docs outside the true
        window."""
        self._tree_shard_safe(rescore_node)
        hits = self.search(query, k=window_size, filters=filters)
        if not hits or k <= 0:
            return []
        ids = [d for d, _ in hits]
        sec: dict[int, float] = {}
        for eng in self.engines:
            sec.update(eng.rescore_scores(rescore_node, ids))
        comb = sorted(
            ((d, query_weight * s
              + rescore_query_weight * sec.get(d, 0.0))
             for d, s in hits), key=lambda ds: (-ds[1], ds[0]))
        return comb[:k]

    def facet_filters(self, query: str, buckets: dict[str, dict],
                      filters: dict | None = None
                      ) -> list[tuple[str, int]]:
        """filters-agg scatter-gather: per-shard named-bucket counts
        sum exactly (shard-safe trees only)."""
        for node in buckets.values():
            self._tree_shard_safe(node)
        totals: dict[str, int] = {}
        for eng in self.engines:
            for name, c in eng.facet_filters(query, buckets,
                                             filters=filters):
                totals[name] = totals.get(name, 0) + c
        return sorted(totals.items())

    def facet_composite(self, query: str, sources: list[str],
                        size: int = 10, after: tuple | None = None,
                        filters: dict | None = None) -> list[dict]:
        """Composite-agg scatter-gather: merge per-shard
        first-``size``-after-cursor pages by key (counts sum — each
        shard's page fully covers every global-page key, see
        QueryEngine.facet_composite), re-sort, re-cut ``size``."""
        totals: dict[tuple, int] = {}
        for eng in self.engines:
            for b in eng.facet_composite(query, sources, size=size,
                                         after=after, filters=filters):
                key = tuple(b["key"][f] for f in sources)
                totals[key] = totals.get(key, 0) + b["doc_count"]
        return [{"key": dict(zip(sources, key)),
                 "doc_count": totals[key]}
                for key in sorted(totals)[:size]]

    def _expansion_unsupported(self, *a, **kw):
        """Prefix/wildcard/fuzzy expand against a per-shard term dict
        with a per-shard cap — different shards could pick different
        expansions, so the scatter-gather would not be rank-identical
        to a single reader. Honest refusal instead (same boundary as
        ``search_qs`` / ``search_compound``)."""
        from baram_ray.query.qparse import UnsupportedQuery
        raise UnsupportedQuery(
            "prefix/wildcard/fuzzy expansion is per-shard-local — "
            "query a single reader for these shapes")

    search_prefix = _expansion_unsupported
    search_wildcard = _expansion_unsupported
    search_regexp = _expansion_unsupported
    search_fuzzy = _expansion_unsupported
    search_phrase_prefix = _expansion_unsupported

    def facets(self, query: str, facet_fields: list[str],
               filters: dict | None = None
               ) -> list[tuple[str, object, int]]:
        """Facet scatter-gather: docs partition by shard, so per-shard
        (facet, value) counts SUM to the global counts exactly — the
        cheap merge that makes terms aggregation multi-node-friendly."""
        totals: dict[tuple[str, object], int] = {}
        for eng in self.engines:
            for f, v, c in eng.facets(query, facet_fields,
                                      filters=filters):
                totals[(f, v)] = totals.get((f, v), 0) + c
        out = sorted(totals.items(), key=lambda kv: (kv[0][0], -kv[1],
                                                     str(kv[0][1])))
        return [(f, v, c) for (f, v), c in out]

    def facet_histogram(self, query: str, field: str, interval: float,
                        filters: dict | None = None
                        ) -> list[tuple[float, int]]:
        """Histogram scatter-gather: per-shard bucket counts sum exactly."""
        totals: dict[float, int] = {}
        for eng in self.engines:
            for b, c in eng.facet_histogram(query, field, interval,
                                            filters=filters):
                totals[b] = totals.get(b, 0) + c
        return sorted(totals.items())

    def facet_stats(self, query: str, field: str,
                    filters: dict | None = None) -> dict:
        """Stats scatter-gather: counts and int sums merge exactly;
        min/max take the extremum over non-empty shards; avg is the
        same single IEEE division sum/count as the one-reader path
        (bit-identical on integer columns)."""
        n, tot, lo, hi = 0, 0, None, None
        for eng in self.engines:
            s = eng.facet_stats(query, field, filters=filters)
            n += s["count"]
            tot += s["sum"]
            if s["count"]:
                lo = s["min"] if lo is None else min(lo, s["min"])
                hi = s["max"] if hi is None else max(hi, s["max"])
        if n == 0:
            return {"count": 0, "min": None, "max": None,
                    "sum": 0, "avg": None}
        return {"count": n, "min": lo, "max": hi, "sum": tot,
                "avg": tot / n}

    def facet_ranges(self, query: str, field: str, ranges: list[dict],
                     filters: dict | None = None
                     ) -> list[tuple[float | None, float | None, int]]:
        """Range scatter-gather: per-shard bucket counts sum exactly
        (same bucket list on every shard)."""
        acc = None
        for eng in self.engines:
            rows = eng.facet_ranges(query, field, ranges,
                                    filters=filters)
            if acc is None:
                acc = [list(r) for r in rows]
            else:
                for a, (_, _, c) in zip(acc, rows):
                    a[2] += c
        return [tuple(a) for a in (acc or [])]

    def facet_cardinality(self, query: str, field: str,
                          filters: dict | None = None) -> int:
        """Exact-cardinality scatter-gather: per-shard distinct value
        SETS (ridden on the facets rows) union exactly — unlike count
        merging, distinct counts cannot simply add."""
        seen: set = set()
        for eng in self.engines:
            seen.update(v for _, v, _ in
                        eng.facets(query, [field], filters=filters))
        return len(seen)

    def match_ids(self, values, **kw) -> np.ndarray:
        parts = [eng.match_ids(values, **kw) for eng in self.engines]
        return np.sort(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)

    def search_script_score(self, node: dict, script: str,
                            k: int = 10, **kw) -> list:
        """script_score scatter-gather: per-shard (score, meta)
        columns are shard-complete for shard-safe trees, so merged
        top-k is rank- and value-identical to one reader."""
        self._tree_shard_safe(node)
        return self._scatter("search_script_score", k,
                             (node, script), kw)

    def facet_missing_count(self, query: str, field: str,
                            filters: dict | None = None) -> int:
        """missing-count scatter-gather: per-shard counts sum."""
        return sum(eng.facet_missing_count(query, field,
                                           filters=filters)
                   for eng in self.engines)

    def stats_partials(self, query: str, field: str,
                       filters: dict | None = None) -> dict:
        """extended_stats scatter-gather: exact int partials merge
        (sums add, extrema min/max) — bit-identical to one reader."""
        acc: dict = {"count": 0}
        for eng in self.engines:
            p = eng.stats_partials(query, field, filters=filters)
            if p.get("count", 0) == 0:
                continue
            if acc["count"] == 0:
                acc = dict(p)
            else:
                acc = {"count": acc["count"] + p["count"],
                       "min": min(acc["min"], p["min"]),
                       "max": max(acc["max"], p["max"]),
                       "sum": acc["sum"] + p["sum"],
                       "sum_of_squares": acc["sum_of_squares"]
                       + p["sum_of_squares"]}
        return acc

    extended_stats_from_partials = staticmethod(
        QueryEngine.extended_stats_from_partials)

    def weighted_avg_partials(self, query: str, value_field: str,
                              weight_field: str,
                              filters: dict | None = None) -> dict:
        acc = {"vw": 0, "w": 0}
        for eng in self.engines:
            p = eng.weighted_avg_partials(query, value_field,
                                          weight_field,
                                          filters=filters)
            acc = {"vw": acc["vw"] + p["vw"], "w": acc["w"] + p["w"]}
        return acc

    def top_docs_meta(self, query: str, fields: list[str],
                      shard_size: int = 100,
                      filters: dict | None = None):
        """sampler scatter-gather: per-shard top ``shard_size``
        concatenate (the OpenSearch per-shard sample contract)."""
        import pandas as pd
        return pd.concat([eng.top_docs_meta(query, fields,
                                            shard_size=shard_size,
                                            filters=filters)
                          for eng in self.engines],
                         ignore_index=True)

    def percentile_rank_partials(self, query: str, field: str,
                                 values: list[float],
                                 filters: dict | None = None) -> dict:
        """percentile_ranks scatter-gather: ≤-counts and totals sum
        exactly across doc shards."""
        acc = {"n": 0, "le": [0] * len(values)}
        for eng in self.engines:
            p = eng.percentile_rank_partials(query, field, values,
                                             filters=filters)
            acc["n"] += p["n"]
            acc["le"] = [a + b for a, b in zip(acc["le"], p["le"])]
        return acc

    def facet_multi_terms(self, query: str, fields: list[str],
                          filters: dict | None = None) -> list:
        """multi_terms scatter-gather: per-tuple counts sum exactly;
        re-sorted to the global (count desc, key asc) order."""
        acc: dict[tuple, int] = {}
        for eng in self.engines:
            for tup, c in eng.facet_multi_terms(query, fields,
                                                filters=filters):
                acc[tup] = acc.get(tup, 0) + c
        out = list(acc.items())
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    def facet_cardinality_approx(self, query: str, field: str,
                                 filters: dict | None = None,
                                 p: int = 12) -> int:
        """Approximate-cardinality scatter-gather: per-shard HLL
        registers merge by elementwise max — BIT-IDENTICAL to a single
        reader's registers (same fixed hash), so the estimate is too."""
        from baram_ray.sketches import hll_estimate, hll_merge
        regs = hll_merge([eng.cardinality_registers(query, field,
                                                    filters, p)
                          for eng in self.engines])
        return int(round(hll_estimate(regs)))

    def facet_group_stats(self, query: str, by: str, field: str,
                          filters: dict | None = None) -> list[tuple]:
        """Grouped-stats scatter-gather: per-bucket counts and int
        sums add exactly, min/max take the extremum, avg is the same
        single division sum/count as one reader — bit-identical on
        integer columns. Re-sorted to the global bucket order."""
        acc: dict = {}
        for eng in self.engines:
            for v, c, lo, hi, tot, _ in eng.facet_group_stats(
                    query, by, field, filters=filters):
                if v in acc:
                    a = acc[v]
                    acc[v] = [a[0] + c, min(a[1], lo), max(a[2], hi),
                              a[3] + tot]
                else:
                    acc[v] = [c, lo, hi, tot]
        rows = [(v, c, lo, hi, tot, tot / c)
                for v, (c, lo, hi, tot) in acc.items()]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows

    def facet_date_histogram(self, query: str, field: str,
                             calendar_interval: str | None = None,
                             fixed_interval: int | None = None,
                             filters: dict | None = None
                             ) -> list[tuple[str, int, int]]:
        """date_histogram scatter-gather: per-shard bucket counts sum
        exactly (same truncation rule on every shard)."""
        totals: dict[tuple[str, int], int] = {}
        for eng in self.engines:
            for s, u, c in eng.facet_date_histogram(
                    query, field, calendar_interval=calendar_interval,
                    fixed_interval=fixed_interval, filters=filters):
                totals[(s, u)] = totals.get((s, u), 0) + c
        return [(s, u, c)
                for (s, u), c in sorted(totals.items(),
                                        key=lambda kv: kv[0][1])]

    def facet_date_group_stats(self, query: str, field: str,
                               value_field: str,
                               calendar_interval: str | None = None,
                               fixed_interval: int | None = None,
                               filters: dict | None = None
                               ) -> list[tuple]:
        """date_histogram + metric sub-agg scatter-gather: per-bucket
        counts and int sums add exactly, min/max take the extremum,
        avg is the same single sum/count division as one reader —
        bit-identical on integer columns. Re-sorted by bucket key."""
        acc: dict = {}
        for eng in self.engines:
            for s, u, c, lo, hi, tot, _ in eng.facet_date_group_stats(
                    query, field, value_field,
                    calendar_interval=calendar_interval,
                    fixed_interval=fixed_interval, filters=filters):
                if (s, u) in acc:
                    a = acc[(s, u)]
                    acc[(s, u)] = [a[0] + c, min(a[1], lo),
                                   max(a[2], hi), a[3] + tot]
                else:
                    acc[(s, u)] = [c, lo, hi, tot]
        return [(s, u, c, lo, hi, tot, tot / c)
                for (s, u), (c, lo, hi, tot)
                in sorted(acc.items(), key=lambda kv: kv[0][1])]

    def facet_percentiles(self, query: str, field: str,
                          percents: list[float] | None = None,
                          filters: dict | None = None) -> dict:
        """Exact-percentile scatter-gather: per-shard (value, count)
        pairs merge by addition (docs partition by shard), then the
        same nearest-rank selection as one reader — bit-identical."""
        percents = percents or [1, 5, 25, 50, 75, 95, 99]
        totals: dict[float, int] = {}
        for eng in self.engines:
            for v, c in eng.facet_value_counts(query, field,
                                               filters=filters):
                totals[v] = totals.get(v, 0) + c
        return QueryEngine.percentiles_from_counts(
            sorted(totals.items()), percents)

    def facet_top_hits(self, query: str, by: str, sort_field: str,
                       size: int = 3, ascending: bool = False,
                       filters: dict | None = None) -> list[dict]:
        """top_hits scatter-gather: per-bucket counts sum; per-shard
        top lists concatenate, re-sort by (sort_field, doc_id) and
        re-cut — exact because each shard returns its first ``size``
        under the same total order."""
        acc: dict = {}
        for eng in self.engines:
            for b in eng.facet_top_hits(query, by, sort_field,
                                        size=size, ascending=ascending,
                                        filters=filters):
                a = acc.setdefault(b["key"], {"doc_count": 0,
                                              "hits": []})
                a["doc_count"] += b["doc_count"]
                a["hits"].extend(b["hits"])
        sgn = 1 if ascending else -1
        buckets = []
        for key, a in acc.items():
            a["hits"].sort(key=lambda h: (sgn * h[sort_field],
                                          h["doc_id"]))
            buckets.append({"key": key, "doc_count": a["doc_count"],
                            "hits": a["hits"][:size]})
        buckets.sort(key=lambda b: (-b["doc_count"], str(b["key"])))
        return buckets

    def facet_significant_text(self, query: str, size: int = 10,
                               min_doc_count: int = 3,
                               field: str | None = None,
                               filters: dict | None = None
                               ) -> list[tuple[str, int, int, float]]:
        """significant_text scatter-gather: per-shard fg counts and
        fg totals SUM (docs partition by shard); bg_df and bg_total
        are global already (termdict df / global n_docs — identical
        on every shard, taken once per term). Scoring runs once on
        the merged counts with the same fixed expression order →
        bit-identical to a single reader."""
        fg: dict[str, int] = {}
        bg: dict[str, int] = {}
        fg_total = 0
        bg_total = 0
        for eng in self.engines:
            r = eng.r
            fld = field or r.fields[0]
            ok = eng._conj_mask(query, filters)
            fg_total += int(np.count_nonzero(ok))
            bg_total = int(r.n_docs)      # global — same on all shards
            for t in r._term_list(fld):
                pl = r.postings.get((fld, t))
                if pl is None:
                    continue
                bg_df = r.df_global(fld, t, pl)
                if bg_df < min_doc_count:
                    continue
                ranks, _ = pl.decode_all()
                fg[t] = fg.get(t, 0) + int(
                    np.count_nonzero(ok[ranks - r.rank_base]))
                bg[t] = bg_df
        if fg_total == 0:
            return []
        rows = [(t, c, bg[t]) for t, c in fg.items()
                if c >= min_doc_count]
        return QueryEngine.score_significant(rows, fg_total,
                                             bg_total)[:size]

    def search_qs(self, q: str, k: int = 10, **kw):
        """Query-string routing on the sharded engine: parses like the
        single reader, then scatter-gathers through the shard-safe ops
        (search / search_bool / search_phrase / search_compound —
        phrases mix freely with terms via the compound path). Prefix,
        wildcard and fuzzy expansion are term-dict-local per shard
        (expansion caps could pick different terms per shard), so those
        shapes raise ``UnsupportedQuery`` here rather than return
        subtly different rankings — use a single reader or the explicit
        per-shard API."""
        from baram_ray.query.qparse import (
            UnsupportedQuery, _compound_clauses, parse,
        )
        plan = parse(q)
        if any(clause_kind(s) not in ("match", "phrase")
               for _, s in plan.specials):
            raise UnsupportedQuery(
                "prefix/wildcard/fuzzy expansion is per-shard-local — "
                "query a single reader for these shapes")
        filters = {**(kw.pop("filters", None) or {}), **plan.filters}
        filters = filters or None
        has_terms = bool(plan.must or plan.should or plan.must_not)
        if plan.specials:
            if len(plan.specials) == 1 and not has_terms:
                pol, spec = plan.specials[0]
                if pol == "must_not":
                    return []
                return self.search_phrase(
                    spec["phrase"], k=k, slop=int(spec.get("slop", 0)),
                    filters=filters, **kw)
            g = _compound_clauses(plan)
            return self.search_compound(must=g["must"] or None,
                                        should=g["should"] or None,
                                        must_not=g["must_not"] or None,
                                        k=k, filters=filters, **kw)
        if plan.must or plan.must_not:
            return self.search_bool(must=plan.must or None,
                                    should=plan.should or None,
                                    must_not=plan.must_not or None,
                                    k=k, filters=filters, **kw)
        if plan.should:
            return self.search(" ".join(plan.should), k=k,
                               filters=filters, **kw)
        if filters:
            raise UnsupportedQuery("filters-only string has no ranking")
        return []

    def search_collapse(self, query: str, collapse_field: str,
                        k: int = 10, **kw
                        ) -> list[tuple[int, float, object]]:
        """Collapse scatter-gather: each shard returns ITS collapsed
        top-k; the union provably contains every globally-top-k group's
        best hit (a group in the global top-k ranks above all but <k
        groups inside the shard holding its best hit), so re-collapsing
        the merged, re-sorted union is exact."""
        hits: list[tuple[int, float, object]] = []
        for eng in self.engines:
            hits.extend(eng.search_collapse(query, collapse_field,
                                            k=k, **kw))
        hits.sort(key=lambda t: (-t[1], t[0]))
        out, seen = [], set()
        for d, s, key in hits:
            if key in seen:
                continue
            seen.add(key)
            out.append((d, s, key))
            if len(out) == k:
                break
        return out

    def search_collapse_sorted(self, query: str, collapse_field: str,
                               sort_by: str, k: int = 10,
                               ascending: bool = False,
                               filters: dict | None = None
                               ) -> list[tuple[int, object, object]]:
        """Sorted-collapse scatter-gather: same re-collapse argument as
        ``search_collapse``, with (sort_value, doc_id) as the key."""
        hits: list[tuple[int, object, object]] = []
        for eng in self.engines:
            hits.extend(eng.search_collapse_sorted(
                query, collapse_field, sort_by, k=k,
                ascending=ascending, filters=filters))
        hits.sort(key=lambda t: ((t[1], t[0]) if ascending
                                 else (_RevKey(t[1]), t[0])))
        out, seen = [], set()
        for d, v, g in hits:
            if g in seen:
                continue
            seen.add(g)
            out.append((d, v, g))
            if len(out) == k:
                break
        return out

    def search_sorted(self, query: str, sort_by: str, k: int = 10,
                      ascending: bool = True,
                      filters: dict | None = None,
                      after: tuple | None = None) -> list:
        """Sorted-retrieval scatter-gather: merge each shard's top-k by
        the same (value, doc_id) key — identical to a single reader.
        The ``after`` cursor filters per shard before each local
        top-k, so pagination composes exactly."""
        hits = []
        for eng in self.engines:
            hits.extend(eng.search_sorted(query, sort_by, k=k,
                                          ascending=ascending,
                                          filters=filters,
                                          after=after))
        hits.sort(key=lambda dv: ((dv[1], dv[0]) if ascending
                                  else (_RevKey(dv[1]), dv[0])))
        return hits[:k]


class QueryActor:
    """Actor-pool UDF: one resident index per actor, batched query eval.

    Usage::

        queries = ray.data.from_items([{"query_id": 0, "text": "...", "k": 10}])
        res = queries.map_batches(QueryActor, fn_constructor_args=(index_dir,),
                                  batch_format="pandas", concurrency=4)

    Output rows: (query_id, rank, doc_id, score).
    """

    def __init__(self, index_dir: str, boosts: dict[str, float] | None = None,
                 algorithm: str = "auto", filters: dict | None = None,
                 min_score: float | None = None,
                 shard_range: tuple[int, int] | None = None,
                 mode: str = "bm25", collapse_field: str | None = None,
                 round6: bool = False):
        self.engine = QueryEngine(index_dir, shard_range=shard_range)
        self.boosts = boosts
        self.algorithm = algorithm
        self.filters = filters
        self.min_score = min_score
        self.mode = mode                      # "bm25" | "phrase" | ...
        self.collapse_field = collapse_field  # for mode="collapse"
        # round scores in the actor (vs a trailing map_batches stage):
        # Ray Data skips tasks for empty input blocks and emits a
        # SCHEMALESS empty block in their place, so a trailing stage
        # silently drops the output schema whenever a query block is
        # empty — rounding here keeps the typed frame end-to-end and
        # saves a task launch per block
        self.round6 = round6

    def refresh(self) -> bool:
        """Pool-wide delta visibility: call on every resident actor
        after a delta commit (``ray.get([a.refresh.remote() for a in
        pool])``) — new docs become searchable with no actor restart
        and no alias swap."""
        return self.engine.refresh()

    def serve(self, kind: str, text: str, k: int = 10) -> list:
        """Single-request entry for RESIDENT serving
        (``ray.remote(QueryActor)`` actors in a pool): dispatch by
        request kind — the closed-loop load benchmark's surface
        (``bench.py --serve``). Returns (doc_id, score) pairs."""
        if kind == "qs":
            return self.engine.search_qs(text, k=k)
        if kind == "dsl":
            import json as _json
            from baram_ray.query.dsl import execute_dsl
            return execute_dsl(self.engine, _json.loads(text), max_k=k)
        if kind == "phrase":
            return self.engine.search_phrase(text, k=k)
        if kind == "bool":
            toks = text.split()
            return self.engine.search_bool(must=toks[:1],
                                           should=toks[1:3], k=k)
        return self.engine.search(text, k=k,
                                  algorithm=self.algorithm)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        qids, ranks, docs, scores = [], [], [], []
        groups: list = []                     # collapse mode only
        ks = batch["k"] if "k" in batch.columns else pd.Series([10] * len(batch))
        def clauses(col, i):
            v = batch[col].iloc[i] if col in batch.columns else ""
            return [c for c in str(v or "").split(";") if c.strip()]

        for i, (qid, text, k) in enumerate(
                zip(batch["query_id"], batch["text"], ks)):
            if self.mode == "bool":
                # clause columns: must/should/must_not, ";"-separated
                hits = self.engine.search_bool(
                    must=clauses("must", i), should=clauses("should", i),
                    must_not=clauses("must_not", i),
                    minimum_should_match=(
                        int(batch["msm"].iloc[i])
                        if "msm" in batch.columns else None),
                    k=int(k), boosts=self.boosts, filters=self.filters,
                    min_score=self.min_score)
            elif self.mode == "fuzzy":
                hits = self.engine.search_fuzzy(
                    str(text), k=int(k), boosts=self.boosts,
                    filters=self.filters, min_score=self.min_score)
            elif self.mode == "prefix":
                hits = self.engine.search_prefix(
                    str(text), k=int(k), boosts=self.boosts,
                    filters=self.filters, min_score=self.min_score)
            elif self.mode == "wildcard":
                hits = self.engine.search_wildcard(
                    str(text), k=int(k), boosts=self.boosts,
                    filters=self.filters, min_score=self.min_score)
            elif self.mode == "phrase":
                hits = self.engine.search_phrase(
                    str(text), k=int(k), boosts=self.boosts,
                    filters=self.filters, min_score=self.min_score,
                    slop=(int(batch["slop"].iloc[i])
                          if "slop" in batch.columns else 0))
            elif self.mode == "phrase_prefix":
                hits = self.engine.search_phrase_prefix(
                    str(text), k=int(k), boosts=self.boosts,
                    filters=self.filters, min_score=self.min_score)
            elif self.mode == "dismax":
                # "text" carries ";"-separated match clauses
                hits = self.engine.search_dismax(
                    [c.strip() for c in str(text).split(";")
                     if c.strip()],
                    tie_breaker=(float(batch["tie_breaker"].iloc[i])
                                 if "tie_breaker" in batch.columns
                                 else 0.0),
                    k=int(k), boosts=self.boosts, filters=self.filters,
                    min_score=self.min_score)
            elif self.mode == "collapse":
                rows3 = self.engine.search_collapse(
                    str(text), self.collapse_field, k=int(k),
                    boosts=self.boosts, filters=self.filters,
                    algorithm=self.algorithm)
                hits = [(d, s) for d, s, _ in rows3]
                groups.extend(key for _, _, key in rows3)
            else:
                hits = self.engine.search(str(text), k=int(k), boosts=self.boosts,
                                          algorithm=self.algorithm,
                                          filters=self.filters,
                                          min_score=self.min_score)
            for rank, (d, s) in enumerate(hits, 1):
                qids.append(qid); ranks.append(rank); docs.append(d); scores.append(s)
        out = pd.DataFrame({
            "query_id": np.asarray(qids, dtype=np.int64),
            "rank": np.asarray(ranks, dtype=np.int64),
            "doc_id": np.asarray(docs, dtype=np.int64),
            "score": np.asarray(scores, dtype=np.float64),
        })
        if self.round6:
            out["score"] = out["score"].round(6)
        if self.mode == "collapse":
            out["group"] = pd.Series(groups, dtype="object").astype(str)
        return out
