"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-LEARNING counterpart to the fixed vocab/encoder in
``tokenizer.py`` (reference tokenizer state: SURVEY.md §2.3 A2).

Shape, in two phases:

1. **Word-frequency table** — the only corpus-sized pass: lowercase
   whitespace pre-tokenization inside ``map_batches`` with per-batch
   combining, then one word-keyed exchange. Everything after runs on
   the (vocab-bounded) word table, exactly how production trainers
   avoid re-scanning the corpus per merge.
2. **Merge loop over ACTOR-SHARDED word state** — the word table
   hash-shards across a pool of ``BpeShard`` actors; each round every
   shard returns its (pair → weighted count) partials (bounded by its
   live pair set), the driver sums the dicts, picks the argmax pair
   (ties: higher count, then lexicographic — fully deterministic),
   and broadcasts the winning pair back; shards apply the merge to
   their words locally. N merges = N rounds of small messages; the
   word state never moves after the initial shard. This is the
   documented raw-actor case (SURVEY.md §7.2): a Dataset can't hold
   mutable per-round state, so the shard actors do.

Determinism: word order never matters (counts are keyed), ties break
lexicographically, so any shard layout yields the identical merge
list (tested: sharded == single-process reference implementation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from baram_ray.util import grouped_agg

END = "</w>"     # end-of-word marker (keeps merges word-internal)


def word_counts(ds, col: str = "text", num_buckets: int = 8):
    """Corpus pass: Dataset[(word, n)] — lowercase whitespace tokens,
    per-batch combiner, one word-keyed exchange."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in df[col].astype(str):
            toks.extend(t.lower().split())
        if not toks:
            return pd.DataFrame({"word": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        u, c = np.unique(np.asarray(toks, dtype=object),
                         return_counts=True)
        return pd.DataFrame({"word": u, "n": c.astype(np.int64)})

    return grouped_agg(ds.map_batches(part, batch_format="pandas"),
                       ["word"], {"n": ("n", "sum")},
                       num_buckets=num_buckets)


def _pair_counts(words: dict[tuple, int]) -> dict[tuple, int]:
    out: dict[tuple, int] = {}
    for sym, n in words.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            out[p] = out.get(p, 0) + n
    return out


def _apply_merge(sym: tuple, a: str, b: str, ab: str) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pairs_of(sym: tuple) -> dict[tuple, int]:
    d: dict[tuple, int] = {}
    for i in range(len(sym) - 1):
        p = (sym[i], sym[i + 1])
        d[p] = d.get(p, 0) + 1
    return d


@ray.remote
class BpeShard:
    """One shard of the symbolized word-frequency table.

    Maintains the pair-count table INCREMENTALLY (the production-BPE
    trick): alongside {symbol_tuple: count} it keeps
    {pair: weighted count} and an inverted index {pair: words that
    contain it}, so ``apply`` touches only the words containing the
    merged pair and adjusts the count diffs — O(affected words) per
    merge instead of a full shard rescan. The naive full-recount lives
    on as ``bpe_train_local``, the independent oracle the incremental
    bookkeeping is tested against.

    Message size: the merge loop uses the THRESHOLD-ALGORITHM top-C
    exchange (``top_pairs`` / ``counts_of``) — per round each shard
    ships only its C best pairs plus exact counts for the driver's
    candidate set, so messages are O(shards × C) regardless of vocab;
    the full live pair table (``pair_counts``) remains for tests and
    diagnostics only."""

    def __init__(self, words: list[str], counts: list[int]):
        self.words: dict[tuple, int] = {}
        for w, n in zip(words, counts):
            sym = tuple(w) + (END,)
            self.words[sym] = self.words.get(sym, 0) + int(n)
        self.pc: dict[tuple, int] = {}
        self.index: dict[tuple, set] = {}
        for sym, n in self.words.items():
            for p, c in _pairs_of(sym).items():
                self.pc[p] = self.pc.get(p, 0) + c * n
                self.index.setdefault(p, set()).add(sym)

    def pair_counts(self) -> dict:
        return self.pc

    def top_pairs(self, c: int) -> tuple[list, int]:
        """Top-``c`` live pairs by (count desc, pair asc) plus this
        shard's THRESHOLD — the count of its c-th pair (0 when the
        shard reported everything). Any pair the shard did NOT report
        contributes at most the threshold to a global total; the
        driver sums thresholds into the certainty bound."""
        import heapq
        if len(self.pc) <= c:
            items = sorted(self.pc.items(), key=lambda kv: (-kv[1], kv[0]))
            return items, 0
        items = heapq.nsmallest(c, self.pc.items(),
                                key=lambda kv: (-kv[1], kv[0]))
        return items, int(items[-1][1])

    def counts_of(self, pairs: list) -> list[int]:
        """Exact local counts for the driver's candidate set (0 when a
        pair is not live on this shard)."""
        return [int(self.pc.get(tuple(p), 0)) for p in pairs]

    def apply(self, a: str, b: str) -> None:
        pair, ab = (a, b), a + b
        for sym in list(self.index.get(pair, ())):
            n = self.words.pop(sym, None)
            if n is None:
                continue
            old_pairs = _pairs_of(sym)
            new_sym = _apply_merge(sym, a, b, ab)
            self.words[new_sym] = self.words.get(new_sym, 0) + n
            new_pairs = _pairs_of(new_sym)
            for p in set(old_pairs) | set(new_pairs):
                delta = (new_pairs.get(p, 0) - old_pairs.get(p, 0)) * n
                if delta:
                    v = self.pc.get(p, 0) + delta
                    if v > 0:
                        self.pc[p] = v
                    else:
                        self.pc.pop(p, None)
                if p in old_pairs:
                    s = self.index.get(p)
                    if s is not None:
                        s.discard(sym)
                        if not s:
                            del self.index[p]
                if p in new_pairs:
                    self.index.setdefault(p, set()).add(new_sym)


def bpe_train_local(word_freq: dict[str, int], n_merges: int,
                    min_freq: int = 2) -> list[tuple[str, str, int]]:
    """Single-process reference trainer — the in-repo oracle the
    distributed path is tested against. Returns
    [(left, right, count), ...] in merge order."""
    words = {}
    for w, n in word_freq.items():
        sym = tuple(w) + (END,)
        words[sym] = words.get(sym, 0) + int(n)
    merges = []
    for _ in range(n_merges):
        pc = _pair_counts(words)
        if not pc:
            break
        # deterministic: max count, ties lexicographically SMALLEST pair
        top = max(pc.values())
        if top < min_freq:
            break
        best = min(p for p, c in pc.items() if c == top)
        a, b = best
        ab = a + b
        nxt = {}
        for sym, n in words.items():
            if a in sym:
                sym = _apply_merge(sym, a, b, ab)
            nxt[sym] = nxt.get(sym, 0) + n
        words = nxt
        merges.append((a, b, int(top)))
    return merges


def _best_pair_threshold(shards: list, top_c: int):
    """One merge round via the threshold algorithm (Fagin's TA over
    summed partials): shards report top-C pairs + their C-th count as
    a threshold; the driver fetches EXACT totals for the candidate
    union and accepts the winner only when its total strictly beats
    the sum of thresholds (an unreported pair can never exceed that
    bound — strict, so a lexicographically-smaller unseen tie can't
    lurk below it). Doubles C until certain. Returns
    (pair, count) or None when no pairs remain."""
    c = top_c
    while True:
        tops = ray.get([s.top_pairs.remote(c) for s in shards])
        cand = sorted({tuple(p) for items, _ in tops
                       for p, _ in items})
        if not cand:
            return None
        thresholds = [thr for _, thr in tops]
        bound = sum(thresholds)
        exact = ray.get([s.counts_of.remote(cand) for s in shards])
        totals = np.asarray(exact, dtype=np.int64).sum(axis=0)
        top = int(totals.max())
        best = min(p for p, t in zip(cand, totals) if t == top)
        if top > bound or all(t == 0 for t in thresholds):
            return best, top
        c *= 2          # uncertain: widen the per-shard report


def bpe_train(ds, col: str = "text", n_merges: int = 64,
              min_freq: int = 2, num_shards: int = 4,
              top_c: int = 64) -> pd.DataFrame:
    """Distributed trainer: corpus → word counts → actor-sharded merge
    loop with the top-C threshold exchange (per-round messages are
    O(shards × C), never shard-pair-table-sized). Returns
    DataFrame[(rank, left, right, freq)]."""
    wc = word_counts(ds, col).to_pandas()      # vocab-bounded
    shards = []
    if len(wc):
        h = pd.util.hash_array(wc["word"].to_numpy(object)) % num_shards
        for s in range(num_shards):
            part = wc[h == s]
            if len(part):
                shards.append(BpeShard.remote(
                    part["word"].tolist(), part["n"].tolist()))
    merges = []
    for rank in range(n_merges):
        found = _best_pair_threshold(shards, top_c) if shards else None
        if found is None:
            break
        (a, b), top = found
        if top < min_freq:
            break
        ray.get([s.apply.remote(a, b) for s in shards])
        merges.append({"rank": rank + 1, "left": a, "right": b,
                       "freq": int(top)})
    for s in shards:
        ray.kill(s)
    cols = {"rank": "int64", "left": "object", "right": "object",
            "freq": "int64"}
    if not merges:
        return pd.DataFrame({c: pd.Series(dtype=d)
                             for c, d in cols.items()})
    out = pd.DataFrame(merges)
    out["rank"] = out["rank"].astype("int64")
    out["freq"] = out["freq"].astype("int64")
    return out[list(cols)]


def bpe_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy encode with a learned merge list (application order =
    merge order, the standard BPE inference rule)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    out: list[str] = []
    for w in text.lower().split():
        sym = list(tuple(w) + (END,))
        while len(sym) > 1:
            pairs = [(ranks.get((sym[i], sym[i + 1]), None), i)
                     for i in range(len(sym) - 1)]
            cand = [(r, i) for r, i in pairs if r is not None]
            if not cand:
                break
            r, i = min(cand)
            sym[i:i + 2] = [sym[i] + sym[i + 1]]
        out.extend(sym)
    return out


class BpeEncodeStage:
    """Actor-pool stage applying a TRAINED merge list to documents
    (map_batches callable-class shape: ranks table built once per
    actor in ``__init__``, per-word memo cache across batches — word
    frequency follows Zipf, so the cache hit rate approaches 1)."""

    def __init__(self, merges: list[tuple[str, str]], col: str = "text"):
        self.ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
        self.col = col
        self._memo: dict[str, int] = {}

    def _word_tokens(self, w: str) -> int:
        hit = self._memo.get(w)
        if hit is not None:
            return hit
        sym = list(tuple(w) + (END,))
        while len(sym) > 1:
            cand = [(r, i) for i in range(len(sym) - 1)
                    if (r := self.ranks.get((sym[i], sym[i + 1])))
                    is not None]
            if not cand:
                break
            _, i = min(cand)
            sym[i:i + 2] = [sym[i] + sym[i + 1]]
        n = len(sym)
        if len(self._memo) < 1_000_000:      # bound actor memory
            self._memo[w] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = [sum(self._word_tokens(w)
                      for w in str(t or "").lower().split())
                  for t in df[self.col]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_bpe_tokens": np.asarray(counts, dtype=np.int64)})
