"""Text-analysis stages — sanitize, language-ID, quality scoring,
fingerprinting (SURVEY.md M1/M2 + the training-data extensions).

All stateful setup (compiled regexes, stopword tables) happens at class
construction — once per actor when used with ``map_batches(Cls,
concurrency=N)``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# ------------------------------------------------------------------ #
# sanitize (reference src/parser/sanitize.rs:39-239)
# ------------------------------------------------------------------ #

_ZW_RE = re.compile("[​‌‍⁠﻿]")
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_TAG_RE = re.compile(r"<[^>]+>")
_MULTI_SPACE_RE = re.compile(r"[ \t]{2,}")
_MULTI_NL_RE = re.compile(r"\n{3,}")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&nbsp;": " "}


def sanitize_text(text: str) -> str:
    """The reference's sanitize chain: zero-width → control chars → HTML
    entities → collapse spaces → trim lines → collapse 3+ newlines
    (``src/parser/sanitize.rs:39-50``)."""
    if not text:
        return ""
    t = _ZW_RE.sub("", text)
    t = _CTRL_RE.sub("", t)
    for k, v in _ENTITIES.items():
        t = t.replace(k, v)
    t = _MULTI_SPACE_RE.sub(" ", t)
    t = "\n".join(line.strip() for line in t.split("\n"))
    t = _MULTI_NL_RE.sub("\n\n", t)
    return t.strip()


def strip_html_tags(text: str) -> str:
    """``src/parser/sanitize.rs:198-214``."""
    return _TAG_RE.sub("", text or "")


def has_content(text: str | None) -> bool:
    """``src/parser/sanitize.rs:215-217`` — non-empty after strip."""
    return bool(text and text.strip())


class SanitizeStage:
    """map_batches UDF: sanitized text + has_content flag."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        clean = [sanitize_text(strip_html_tags(t or "")) for t in texts]
        return batch.append_column(
            "clean_text", pa.array(clean, pa.string())
        ).append_column(
            "has_content", pa.array([has_content(c) for c in clean], pa.bool_()))


# ------------------------------------------------------------------ #
# language-ID (n-gram/stopword heuristic)
# ------------------------------------------------------------------ #

_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "a"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "por", "con"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"},
}


class LangIdStage:
    """Heuristic language-ID: script detection (CJK ranges) + stopword hit
    rates for latin-script languages. Stateless-cheap but class-shaped so
    a trained model would slot in as actor state."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.hangul = re.compile("[가-힯]")
        self.kana = re.compile("[぀-ゟ゠-ヿ]")
        self.han = re.compile("[一-鿿]")

    def predict(self, text: str) -> tuple[str, float]:
        t = text or ""
        n = max(1, len(t))
        if len(self.hangul.findall(t)) / n > 0.1:
            return "ko", 0.9
        if len(self.kana.findall(t)) / n > 0.1:
            return "ja", 0.9
        if len(self.han.findall(t)) / n > 0.1:
            return "zh", 0.8
        words = [w.lower() for w in self.word_re.findall(t)]
        if not words:
            return "unknown", 0.0
        ws = set(words)
        best, hits = "en", -1
        for lang, sw in _LANG_STOPWORDS.items():
            h = len(ws & sw)
            if h > hits:
                best, hits = lang, h
        conf = min(1.0, hits / 5.0) if hits > 0 else 0.1
        return best, round(conf, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array([p[0] for p in preds], pa.string()),
            "confidence": pa.array([p[1] for p in preds], pa.float64()),
        })


# ------------------------------------------------------------------ #
# quality scoring
# ------------------------------------------------------------------ #

class QualityStage:
    """Training-data quality heuristics: length, punctuation ratio,
    stopword ratio, mean word length, digit ratio → composite score."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = _LANG_STOPWORDS["en"]

    def score_one(self, text: str) -> dict:
        t = text or ""
        n = len(t)
        words = t.split()
        nw = len(words)
        punct = sum(1 for c in t if c in ".,;:!?\"'()[]{}")
        digits = sum(1 for c in t if c.isdigit())
        sw = sum(1 for w in words if w.lower() in self.stop)
        mean_wl = (sum(len(w) for w in words) / nw) if nw else 0.0
        punct_ratio = punct / n if n else 0.0
        digit_ratio = digits / n if n else 0.0
        stop_ratio = sw / nw if nw else 0.0
        # composite: in [0,1], higher = better prose-like quality
        score = 0.0
        if nw >= 5:
            score += 0.25
        if 2.0 <= mean_wl <= 12.0:
            score += 0.25
        score += 0.25 * min(1.0, 4.0 * stop_ratio)
        score += 0.25 * (1.0 - min(1.0, 4.0 * max(0.0, digit_ratio - 0.05)))
        # no rounding: every value is a single IEEE division of exact
        # ints (or a fixed-order sum of dyadic products), bit-identical
        # in any engine — rounding would ADD a banker's-vs-half-away tie
        # hazard vs the SQL oracle (e.g. 1/128 = 0.0078125)
        return {
            "n_chars": n, "n_words": nw,
            "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio,
            "stop_ratio": stop_ratio,
            "mean_word_len": mean_wl,
            "quality": score,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self.score_one(t) for t in batch[self.text_col].to_pylist()]
        cols = {"doc_id": batch["doc_id"]}
        for k in rows[0].keys() if rows else []:
            typ = pa.int64() if k in ("n_chars", "n_words") else pa.float64()
            cols[k] = pa.array([r[k] for r in rows], typ)
        return pa.table(cols)


class RepetitionStage:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of a document occupied by its most-frequent word 2-gram
    (``top2_frac``) and the fraction of word 3-gram occurrences that are
    repeats of an earlier 3-gram (``dup3_frac``). High values mark
    boilerplate / generated spam that survives exact dedup. Pure
    per-row token counting (string-bound like QualityStage), zero
    shuffle; both fractions are exact IEEE divisions of small integers,
    so the DuckDB unnest oracle is bit-equal. Docs with fewer than 3
    tokens emit no row (no 3-grams exist — mirrors the oracle's join)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter
        ids, top2, dup3 = [], [], []
        id_arr = batch["doc_id"].to_pylist()
        for did, t in zip(id_arr, batch[self.text_col].to_pylist()):
            toks = (t or "").split()
            if len(toks) < 3:
                continue
            pairs = list(zip(toks, toks[1:]))
            c = Counter(pairs)
            trips = list(zip(toks, toks[1:], toks[2:]))
            ids.append(did)
            top2.append(max(c.values()) / len(pairs))
            dup3.append(1.0 - len(set(trips)) / len(trips))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "top2_frac": pa.array(top2, pa.float64()),
                         "dup3_frac": pa.array(dup3, pa.float64())})


# ------------------------------------------------------------------ #
# document fingerprinting (winnowing rolling hash)
# ------------------------------------------------------------------ #

class FingerprintStage:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram rolling hashes,
    per-window minimum → compact, position-robust fingerprint set.

    Fully vectorized (round-1 verdict item 9): the k-gram hash is the
    paper's own polynomial rolling hash — h(c₁..cₖ) = Σ cᵢ·B^(k−i) in
    uint64 wraparound arithmetic — computed as k shifted vector
    multiply-adds over the byte array (vs. a per-gram blake2b Python
    loop at ~µs/char); the per-window argmin is a sliding_window_view
    reduction. Deterministic, no PYTHONHASHSEED dependence.
    """

    BASE = np.uint64(1_000_003)           # odd multiplier, full-period mod 2^64

    def __init__(self, text_col: str = "text", k: int = 5, window: int = 4):
        self.text_col = text_col
        self.k = k
        self.window = window
        # precomputed B^(k-1) .. B^0
        self.pows = np.array(
            [int(self.BASE) ** e % (1 << 64) for e in range(k - 1, -1, -1)],
            dtype=np.uint64)

    def _gram_hashes(self, t: str) -> np.ndarray:
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        n = len(data) - self.k + 1
        if n <= 0:
            return np.empty(0, dtype=np.int64)
        arr = data.astype(np.uint64)
        h = np.zeros(n, dtype=np.uint64)
        for j in range(self.k):           # k (=5) vector ops, not n Python ops
            h += arr[j: j + n] * self.pows[j]
        # scramble (fibonacci multiplier) so adjacent grams decorrelate,
        # then drop the sign bit for int64 output
        h *= np.uint64(0x9E3779B97F4A7C15)
        return (h >> np.uint64(1)).view(np.int64)

    def fingerprints(self, text: str) -> list[int]:
        t = (text or "").lower()
        hashes = self._gram_hashes(t)
        if len(hashes) == 0:
            return []
        if len(hashes) <= self.window:
            return [int(hashes.min())]
        win = np.lib.stride_tricks.sliding_window_view(hashes, self.window)
        j = np.argmin(win, axis=1) + np.arange(len(win))   # first-min, as
        keep = np.concatenate([[True], j[1:] != j[:-1]])   # the loop did
        return hashes[j[keep]].tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprints(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            "min_fp": pa.array([min(f) if f else 0 for f in fps], pa.int64()),
            "fingerprints": pa.array(fps, pa.list_(pa.int64())),
        })


# ------------------------------------------------------------------ #
# M3: format-dispatch parser with fallback chain (reference
# src/parser/html.rs:47-143 — detect_format → format parser → on
# failure try every parser in fixed order; deleted-article check
# first). The reference's formats are Naver page layouts; here the
# formats are content syntaxes (html / markdown / json / plain) with
# the same detect → parse → fallback-chain machinery.
# ------------------------------------------------------------------ #

_HTML_HINT_RE = re.compile(r"<\s*(html|body|div|p|span|article)\b", re.I)
_MD_HINT_RE = re.compile(r"(^|\n)(#{1,6} |```|\* |- \[|\[[^\]]+\]\()")
_MD_STRIP_RE = re.compile(
    r"```.*?```|`([^`]*)`|\[([^\]]*)\]\([^)]*\)|[*_]{1,3}([^*_]+)[*_]{1,3}"
    r"|^#{1,6} +", re.S | re.M)
_DELETED_MARKERS = ("article not found", "deleted article",
                    "삭제된 기사", "존재하지 않는 기사")


class ParseError(ValueError):
    pass


def detect_format(text: str) -> str:
    """Cheap syntax sniff (reference detect_format, html.rs:82)."""
    if not text or not text.strip():
        return "unknown"
    s = text.lstrip()
    if s[:1] in "{[":
        return "json"
    if _HTML_HINT_RE.search(text):
        return "html"
    if _MD_HINT_RE.search(text):
        return "markdown"
    return "plain"


def _parse_html(text: str) -> str:
    if not _HTML_HINT_RE.search(text):
        raise ParseError("not html")
    out = sanitize_text(strip_html_tags(text))
    if not out:
        raise ParseError("empty after strip")
    return out


def _parse_markdown(text: str) -> str:
    if not _MD_HINT_RE.search(text):
        raise ParseError("not markdown")
    def repl(m: re.Match) -> str:
        return next((g for g in m.groups() if g), " ")
    out = sanitize_text(_MD_STRIP_RE.sub(repl, text))
    if not out:
        raise ParseError("empty after strip")
    return out


def _parse_json(text: str) -> str:
    import json as _json
    try:
        data = _json.loads(text)
    except ValueError as e:
        raise ParseError(str(e)) from None
    strings: list[str] = []

    def walk(v):
        if isinstance(v, str):
            strings.append(v)
        elif isinstance(v, dict):
            for x in v.values():
                walk(x)
        elif isinstance(v, list):
            for x in v:
                walk(x)

    walk(data)
    out = sanitize_text(" ".join(strings))
    if not out:
        raise ParseError("no string content")
    return out


def _parse_plain(text: str) -> str:
    out = sanitize_text(text)
    if not out:
        raise ParseError("empty")
    return out


_PARSERS = {"html": _parse_html, "markdown": _parse_markdown,
            "json": _parse_json, "plain": _parse_plain}
_FALLBACK_ORDER = ("html", "markdown", "json", "plain")


def parse_with_fallback(text: str) -> tuple[str, str, bool]:
    """(parsed_text, format_used, ok) — detected parser first, then the
    fixed fallback chain (reference parse_with_fallback +
    try_fallback_chain, html.rs:67-143); deleted-document markers fail
    fast like the reference's is_deleted_article check."""
    low = (text or "").lower()
    if any(m in low for m in _DELETED_MARKERS):
        return "", "deleted", False
    fmt = detect_format(text)
    tried = [fmt] if fmt in _PARSERS else []
    tried += [f for f in _FALLBACK_ORDER if f not in tried]
    for f in tried:
        try:
            return _PARSERS[f](text), f, True
        except ParseError:
            continue
    return "", "unknown", False


class ParseDispatchStage:
    """map_batches UDF: (doc_id, text) → (doc_id, format_used,
    parse_ok, text_out, n_chars_out)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [parse_with_fallback(t)
                for t in batch[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "format_used": pa.array([f for _, f, _ in outs], pa.string()),
            "parse_ok": pa.array([ok for _, _, ok in outs], pa.bool_()),
            "text_out": pa.array([t for t, _, _ in outs], pa.string()),
            "n_chars_out": pa.array([len(t) for t, _, _ in outs],
                                    pa.int64()),
        })


# ------------------------------------------------------------------ #
# PII detection / redaction
# ------------------------------------------------------------------ #

# RE2-compatible patterns (no lookaround/backrefs) so the DuckDB oracle
# runs the SAME expressions; applied in a fixed order (email → ipv4 →
# phone) so nested matches resolve identically on both sides.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b01[0-9]-[0-9]{3,4}-[0-9]{4}\b", "<PHONE>"),
]


class PiiStage:
    """PII scrub for training corpora: count and redact emails, IPv4
    addresses and KR-format phone numbers (the reference's locale,
    src/i18n — patterns compiled once per actor/worker, M-class batch
    map, zero shuffle). Emits per-doc match counts + the sha256 of the
    redacted text so redaction equality is checkable end-to-end.

    A training-data pipeline runs this before tokenization; counts
    also feed quality filtering (docs that are mostly contact-list
    boilerplate score high on pii density).
    """

    def __init__(self, text_col: str = "text"):
        import re as _re
        self.text_col = text_col
        self.compiled = [(name, _re.compile(pat), repl)
                         for name, pat, repl in PII_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        ids = batch["doc_id"].to_pylist()
        out: dict[str, list] = {"doc_id": ids}
        counts: dict[str, list[int]] = {n: [] for n, _, _ in self.compiled}
        shas: list[str] = []
        for t in batch[self.text_col].to_pylist():
            s = t or ""
            for name, pat, repl in self.compiled:
                s, n = pat.subn(repl, s)
                counts[name].append(n)
            shas.append(hashlib.sha256(s.encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            **{f"n_{name}": pa.array(v, pa.int64())
               for name, v in counts.items()},
            "redacted_sha": pa.array(shas, pa.string()),
        })
