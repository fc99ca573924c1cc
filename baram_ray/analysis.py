"""Text-analysis chains — the analyzer-configuration feature class the
reference gets from OpenSearch (its nori analyzer config,
``src/embedding/mod.rs:247-276``; English indexes use the stock
porter_stem + stop filters). In this engine's architecture an analyzer
chain is a PURE TEXT→TEXT transform applied upstream of the versioned
core tokenizer — the build maps it over the corpus (one
``map_batches`` stage) and the query path applies the same function to
query text, so every rank-identity proof of the core engine carries
over unchanged (the transformed text is just another corpus).

Implements the classic Porter stemmer (Porter 1980, "An algorithm for
suffix stripping" — the exact published 5-step rule set) and a
standard English stopword filter; ``analyze_chain`` composes them.
Per-word results are memoized (zipfian corpora), and everything is a
pure function of its input — byte-identical across workers.
"""

from __future__ import annotations

import functools
import re

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: the number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    prev = None
    for i in range(len(stem)):
        c = _cons(stem, i)
        if prev is False and c:
            m += 1
        prev = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2]
            and _cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    return (len(w) >= 3 and _cons(w, len(w) - 3)
            and not _cons(w, len(w) - 2) and _cons(w, len(w) - 1)
            and w[-1] not in "wxy")


def _replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    """w[:-len(suffix)] + repl when w ends with suffix and the stem's
    measure > min_m-1 … returns None when the suffix doesn't apply."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return w  # suffix matched but condition failed → rule consumed


@functools.lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    """The Porter 1980 stemmer, steps 1a-5b exactly as published."""
    w = word.lower()
    if len(w) <= 2:
        return w
    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # ---- step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # ---- step 2 (longest-match within the step, m(stem) > 0)
    for suf, rep in (("ational", "ate"), ("tional", "tion"),
                     ("enci", "ence"), ("anci", "ance"),
                     ("izer", "ize"), ("abli", "able"), ("alli", "al"),
                     ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
                     ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"),
                     ("iveness", "ive"), ("fulness", "ful"),
                     ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        r = _replace(w, suf, rep, 1)
        if r is not None:
            w = r
            break
    # ---- step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        r = _replace(w, suf, rep, 1)
        if r is not None:
            w = r
            break
    # ---- step 4 (m(stem) > 1); (s|t)ion handled with its guard
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible",
                "ant", "ement", "ment", "ent", "ion", "ou", "ism",
                "ate", "iti", "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # ---- step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# the classic English stop list (the Lucene/Snowball core set)
STOPWORDS = frozenset("""
a an and are as at be but by for if in into is it no not of on or such
that the their then there these they this to was will with
""".split())

_WORD_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]+")


def stem_text(text: str) -> str:
    """Word-wise Porter stemming of a text, whitespace-preserving
    enough for re-tokenization (words map 1:1; non-word runs pass
    through)."""
    if not text:
        return text
    return _WORD_RE.sub(lambda m: porter_stem(m.group(0))
                        if m.group(0)[0].isalpha() else m.group(0),
                        text)


def remove_stopwords_text(text: str) -> str:
    """Drop stopwords (case-insensitive whole words)."""
    if not text:
        return text
    return " ".join(wd for wd in text.split()
                    if wd.lower() not in STOPWORDS)


_FILTERS = {
    "porter": stem_text,
    "stop": remove_stopwords_text,
    "lowercase": lambda t: t.lower() if t else t,
}


def analyze_chain(text: str, filters: tuple[str, ...] | list[str]
                  ) -> str:
    """Compose named text filters in order (the analyzer chain). The
    SAME chain must transform both the corpus (build stage) and query
    text — pure functions keep build/query rank identity."""
    for name in filters:
        fn = _FILTERS.get(name)
        if fn is None:
            raise ValueError(f"unknown analysis filter {name!r} — "
                             f"known: {sorted(_FILTERS)}")
        text = fn(text)
    return text
