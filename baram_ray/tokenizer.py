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


def analyze_query(text: str) -> list[str]:
    """Query-side analyzer: same chain (see module docstring); distinct
    unique terms are NOT deduplicated here — BM25 scoring dedups terms
    itself (a repeated query term scores once per unique term, matching
    Lucene's term-query deduplication in a bool-should)."""
    return tokenize(text)
