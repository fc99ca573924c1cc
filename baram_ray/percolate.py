"""DSL-body percolation — the OpenSearch percolator upgraded from
conjunctive term lists (``pipelines/search.py PercolateStage``) to
full query bodies: registered queries are OpenSearch-style nodes
(bool trees over match / match_phrase / term / terms / range /
exists), and each incoming document is matched against every
registered body in one streaming ``map_batches`` pass — queries ride
the actor closure, no shuffle, no index.

Semantics mirror the engine exactly (same analyzer, same conjunctive
match rule, same sloppy-phrase window rule, same bool
minimum_should_match default), so a percolator hit means the stored
query WOULD retrieve the doc from an index — pinned by a
cross-validation test against ``QueryEngine`` on the same corpus.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa

from baram_ray.tokenizer import analyze_phrase, tokenize_with_positions


def _phrase_matches(toks: list[str], poss: list[int],
                    phrase: list[str], slop: int) -> bool:
    """Ordered span-near over the doc's (token, position) stream —
    the engine's slop rule: an increasing position chain with
    (span - 1) - (m - 1) ≤ slop."""
    if not phrase:
        return False
    pos_by_term = {}
    for t, p in zip(toks, poss):
        pos_by_term.setdefault(t, []).append(p)
    lists = []
    for t in phrase:
        lst = pos_by_term.get(t)
        if not lst:
            return False
        lists.append(lst)
    # greedy forward chain from each start (positions sorted already)
    for p0 in lists[0]:
        b = p0
        ok = True
        for lst in lists[1:]:
            import bisect
            i = bisect.bisect_right(lst, b)
            if i == len(lst):
                ok = False
                break
            b = lst[i]
        if ok and (b - p0) - (len(phrase) - 1) <= slop:
            return True
    return False


def doc_matches(tokset: set[str], toks: list[str], poss: list[int],
                meta: dict[str, Any], node: dict) -> bool:
    """One document against one query node (recursive)."""
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"bad percolator node {node!r}")
    (kind, v), = node.items()
    if kind == "match":
        text = v["query"] if isinstance(v, dict) else v
        terms = analyze_phrase(text)
        return bool(terms) and all(t in tokset for t in terms)
    if kind == "match_phrase":
        d = {"query": v} if isinstance(v, str) else v
        return _phrase_matches(toks, poss,
                               analyze_phrase(d["query"]),
                               int(d.get("slop", 0)))
    if kind == "term":
        (col, val), = v.items()
        if isinstance(val, dict):
            val = val.get("value")
        return meta.get(col) == val
    if kind == "terms":
        (col, vals), = v.items()
        return meta.get(col) in set(vals)
    if kind == "exists":
        x = meta.get(v["field"])
        return x is not None and x == x
    if kind == "range":
        (col, spec), = v.items()
        x = meta.get(col)
        if x is None or x != x:
            return False
        return ((("gte" not in spec) or x >= spec["gte"])
                and (("lte" not in spec) or x <= spec["lte"])
                and (("gt" not in spec) or x > spec["gt"])
                and (("lt" not in spec) or x < spec["lt"]))
    if kind == "match_all":
        return True
    if kind == "bool":
        def group(g):
            x = v.get(g) or []
            return x if isinstance(x, list) else [x]
        for c in group("must"):
            if not doc_matches(tokset, toks, poss, meta, c):
                return False
        for c in group("filter"):
            if not doc_matches(tokset, toks, poss, meta, c):
                return False
        for c in group("must_not"):
            if doc_matches(tokset, toks, poss, meta, c):
                return False
        should = group("should")
        msm = v.get("minimum_should_match")
        if msm is None:
            msm = 0 if (group("must") or group("filter")) else 1
        if should and int(msm) > 0:
            hits = sum(doc_matches(tokset, toks, poss, meta, c)
                       for c in should)
            if hits < int(msm):
                return False
        return True
    raise ValueError(f"percolator does not support {kind!r} nodes")


class DslPercolateStage:
    """map_batches stage: (doc_id, query_id) for every registered
    body the doc matches. Bodies are parsed/validated once per actor
    (``__init__``); per doc the text tokenizes once and every body
    evaluates against the same token set — O(docs × queries), no
    shuffle."""

    def __init__(self, bodies: dict[int, dict],
                 text_col: str = "text",
                 meta_cols: tuple[str, ...] = ()):
        self.bodies = dict(bodies)
        self.text_col = text_col
        self.meta_cols = tuple(meta_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_doc, out_q = [], []
        for _, row in df.iterrows():
            toks, poss = tokenize_with_positions(
                row[self.text_col] or "")
            tokset = set(toks)
            meta = {c: row[c] for c in self.meta_cols}
            for qid, body in self.bodies.items():
                if doc_matches(tokset, toks, poss, meta, body):
                    out_doc.append(int(row["doc_id"]))
                    out_q.append(int(qid))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "query_id": pa.array(out_q, pa.int64())})
