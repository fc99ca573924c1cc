"""Deterministic code/text analyzer — the tokenization the whole index is built on.

Generalizes the reference's nori analyzer configuration
(reference ``src/embedding/mod.rs:247-276``: nori_tokenizer with
``decompound_mode: mixed``, ``discard_punctuation: true``, lowercase filter,
POS stop-tag filter, readingform) to a source-code corpus:

- punctuation is discarded (token boundaries), ASCII is lowercased;
- identifiers are *decompounded* in nori's ``mixed`` mode: a compound
  identifier (``camelCase``, ``snake_case``, ``Dotted.Name``, letter<->digit
  boundaries) emits the whole lowercased identifier **plus** its parts —
  exactly how nori's ``mixed`` emits compound + components;
- CJK runs (Han / Hangul / Kana) fall back to character bigrams (the
  standard CJK analyzer fallback; a run of length 1 emits the single char);
- zero-width / control characters are stripped first (reference sanitize
  pipeline, ``src/parser/sanitize.rs:74-104``).

The index analyzer and the query analyzer are the same function here (the
reference's index/search analyzers differ only by ``nori_readingform``,
which has no analogue for code). The function is pure, versioned and
byte-for-byte deterministic across workers — both the build path and the
query path import THIS function; rank-identity depends on it.
"""

from __future__ import annotations

import functools
import re
from collections import Counter

TOKENIZER_VERSION = "1"

# Maximum emitted token length; longer tokens (minified blobs, base64) are
# truncated rather than dropped so tf/doclen stay deterministic.
MAX_TOKEN_LEN = 64

# Zero-width + BOM characters stripped before tokenization
# (reference src/parser/sanitize.rs:74-84).
_ZERO_WIDTH = dict.fromkeys(map(ord, "​‌‍⁠﻿"))

# One scan finds either an ASCII-ish identifier/number run or a CJK run.
# CJK ranges: Han (incl. ext A), Hiragana, Katakana, Hangul syllables+jamo.
_CJK = "一-鿿㐀-䶿぀-ゟ゠-ヿ가-힯ᄀ-ᇿ"
_WORD_RE = re.compile(rf"([A-Za-z0-9_]+)|([{_CJK}]+)")

# Split points inside an identifier: underscores, lower->Upper, UPPER->Upper+lower
# (HTTPServer -> HTTP, Server), letter<->digit boundaries.
_CAMEL_RE = re.compile(
    r"[a-z]+|[0-9]+|[A-Z]+(?![a-z])|[A-Z][a-z]*"
)
_HAS_SPLIT_RE = re.compile(
    r"_|[a-z][A-Z]|[A-Z]{2}[a-z]|[A-Za-z][0-9]|[0-9][A-Za-z]")


def _split_identifier(word: str) -> list[str]:
    """camelCase/snake_case/digit-boundary split; parts lowercased."""
    parts: list[str] = []
    for seg in word.split("_"):
        if not seg:
            continue
        for m in _CAMEL_RE.finditer(seg):
            parts.append(m.group(0).lower())
    return parts


@functools.lru_cache(maxsize=1 << 16)
def _expand_word(word: str) -> tuple[str, ...]:
    """Token(s) for one identifier word, memoized — corpora are zipfian,
    so the same identifiers recur constantly; the cache turns the regex
    split into a dict hit. Pure function of the word → determinism holds."""
    low = word.lower()
    if _HAS_SPLIT_RE.search(word):
        # compound: emit whole + parts (mixed decompound). The whole
        # keeps underscores so `snake_case` queries match.
        return (low[:MAX_TOKEN_LEN],
                *(p[:MAX_TOKEN_LEN] for p in _split_identifier(word)))
    return (low[:MAX_TOKEN_LEN],)


def tokenize(text: str) -> list[str]:
    """Analyze ``text`` into the token stream the index counts.

    Deterministic; emits compound identifiers + their parts (nori
    ``decompound_mode: mixed`` semantics) and CJK character bigrams.
    """
    if not text:
        return []
    text = text.translate(_ZERO_WIDTH)
    out: list[str] = []
    append = out.append
    extend = out.extend
    for m in _WORD_RE.finditer(text):
        word = m.group(1)
        if word is not None:
            extend(_expand_word(word))
        else:
            run = m.group(2)
            if len(run) == 1:
                append(run)
            else:
                for i in range(len(run) - 1):
                    append(run[i : i + 2])
    return out


def term_counts(text: str) -> Counter:
    """tf map for one document/field."""
    return Counter(tokenize(text))


def tokenize_with_positions(text: str) -> tuple[list[str], list[int]]:
    """Token stream + WORD positions.

    Position semantics (the positional-index contract; compare Lucene's
    position graph for nori ``mixed`` decompound):

    - each identifier word occupies ONE position; a compound identifier's
      whole token and all its parts share that position (so a phrase of
      whole words never falsely matches through a compound's parts);
    - each CJK bigram occupies its own position (consecutive bigrams of a
      run are adjacent — a CJK phrase analyzed the same way aligns);
    - positions count matched words/bigrams only (separators are not
      position gaps), deterministically.
    """
    if not text:
        return [], []
    text = text.translate(_ZERO_WIDTH)
    toks: list[str] = []
    poss: list[int] = []
    p = 0
    for m in _WORD_RE.finditer(text):
        word = m.group(1)
        if word is not None:
            for t in _expand_word(word):
                toks.append(t)
                poss.append(p)
            p += 1
        else:
            run = m.group(2)
            if len(run) == 1:
                toks.append(run)
                poss.append(p)
                p += 1
            else:
                for i in range(len(run) - 1):
                    toks.append(run[i : i + 2])
                    poss.append(p)
                    p += 1
    return toks, poss


def term_positions(text: str) -> tuple[list[str], list[int], list[int]]:
    """Per-term grouped positions: (terms, tfs, flat_positions).

    ``terms[i]`` occurs ``tfs[i]`` times; its positions are the next
    ``tfs[i]`` entries of ``flat_positions`` (sorted non-decreasing — a
    term can repeat at one position when a compound's parts coincide,
    e.g. ``a_a`` → part ``a`` twice at position 0). Term order is
    first-occurrence order, matching ``term_counts`` iteration order, and
    ``sum(tfs) == len(token stream)`` so dl is unchanged vs ``term_counts``.
    """
    toks, poss = tokenize_with_positions(text)
    groups: dict[str, list[int]] = {}
    for t, p in zip(toks, poss):
        g = groups.get(t)
        if g is None:
            groups[t] = [p]
        else:
            g.append(p)
    terms = list(groups.keys())
    tfs = [len(groups[t]) for t in terms]
    flat: list[int] = []
    for t in terms:
        flat.extend(groups[t])
    return terms, tfs, flat


def analyze_phrase(text: str) -> list[str]:
    """Phrase-query analyzer: ONE token per position unit — the whole
    (lowercased, underscore-preserving) identifier token per word, each
    CJK bigram — i.e. the index's position-bearing stream with compound
    parts removed. Query token i is matched at document position
    ``base + i``; adjacency here == adjacency in
    :func:`tokenize_with_positions` output."""
    if not text:
        return []
    text = text.translate(_ZERO_WIDTH)
    out: list[str] = []
    for m in _WORD_RE.finditer(text):
        word = m.group(1)
        if word is not None:
            out.append(word.lower()[:MAX_TOKEN_LEN])
        else:
            run = m.group(2)
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
    return out


def analyze_query(text: str) -> list[str]:
    """Query-side analyzer: same chain (see module docstring); distinct
    unique terms are NOT deduplicated here — BM25 scoring dedups terms
    itself (a repeated query term scores once per unique term, matching
    Lucene's term-query deduplication in a bool-should)."""
    return tokenize(text)
