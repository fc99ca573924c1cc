"""Snippet / highlight generation for search results.

Rebuilds the reference's highlight surface (``src/embedding/mod.rs:
612-621`` — 1 title fragment + up to 3 content fragments of ~150 chars,
``<mark>``/``</mark>`` tags; ``:629-676`` — flattened snippet list on each
hit; ``:855-869`` — 500-char word-boundary content truncation). Pure,
deterministic functions: the engine returns (doc_id, score); the search
pipeline joins hit docs back to their text and maps these over the k
result rows (k is tiny — this never touches the corpus at large).
"""

from __future__ import annotations

import re

PRE_TAG = "<mark>"
POST_TAG = "</mark>"
FRAGMENT_SIZE = 150          # reference: content fragment_size 150
MAX_FRAGMENTS = 3            # reference: number_of_fragments 3
TRUNCATE_LEN = 500           # reference: truncate_string(s, 500)


def truncate_words(s: str, max_len: int = TRUNCATE_LEN) -> str:
    """Word-boundary truncation (reference truncate_string,
    ``src/embedding/mod.rs:855-869``): take the first ``max_len`` chars,
    cut back to the last space, append '...'."""
    if len(s) <= max_len:
        return s
    truncated = s[:max_len]
    last_space = truncated.rfind(" ")
    if last_space != -1:
        truncated = truncated[:last_space]
    return truncated + "..."


def _term_pattern(terms: list[str]) -> re.Pattern | None:
    """Case-insensitive word-boundary pattern over the query terms
    (longest-first so compound tokens win over their parts)."""
    terms = sorted({t for t in terms if t}, key=len, reverse=True)
    if not terms:
        return None
    alt = "|".join(re.escape(t) for t in terms)
    return re.compile(rf"(?<![0-9A-Za-z_])({alt})(?![0-9A-Za-z_])",
                      re.IGNORECASE)


def highlight_fragments(text: str, terms: list[str], *,
                        n_fragments: int = MAX_FRAGMENTS,
                        fragment_size: int = FRAGMENT_SIZE) -> list[str]:
    """Up to ``n_fragments`` snippets of ≈``fragment_size`` chars, each
    centered on a term occurrence, matched terms wrapped in mark tags.

    Fragment selection (deterministic stand-in for Lucene's scored
    fragmenter): the FIRST occurrence of each distinct term anchors a
    fragment first (term coverage beats repetition), remaining slots fill
    left-to-right with occurrences not already covered. Windows snap to
    word boundaries.
    """
    if not text:
        return []
    pat = _term_pattern(terms)
    if pat is None:
        return []
    matches = list(pat.finditer(text))
    if not matches:
        return []
    # anchor order: first hit of each distinct (lowercased) term, in text
    # order; then every other occurrence, in text order
    seen: set[str] = set()
    firsts, rest = [], []
    for m in matches:
        t = m.group(1).lower()
        (rest if t in seen else firsts).append(m)
        seen.add(t)
    spans: list[tuple[int, int]] = []       # chosen (lo, hi) windows

    def covered(m) -> bool:
        return any(lo <= m.start() < hi for lo, hi in spans)

    for m in firsts + rest:
        if len(spans) >= n_fragments:
            break
        if covered(m):
            continue
        half = max(0, (fragment_size - (m.end() - m.start())) // 2)
        lo = max(0, m.start() - half)
        hi = min(len(text), lo + fragment_size)
        # snap to word boundaries (don't cut words mid-way)
        if lo > 0:
            sp = text.find(" ", lo)
            if sp != -1 and sp < m.start():
                lo = sp + 1
        if hi < len(text):
            sp = text.rfind(" ", m.end(), hi)
            if sp != -1:
                hi = sp
        spans.append((lo, hi))
    spans.sort()
    return [pat.sub(rf"{PRE_TAG}\1{POST_TAG}", text[lo:hi])
            for lo, hi in spans]


def snippets_for_hit(text: str, terms: list[str]) -> dict:
    """The per-hit highlight payload the reference attaches to every
    SearchResult: flattened fragment list + truncated content."""
    return {
        "highlights": highlight_fragments(text, terms),
        "content": truncate_words(text),
    }
