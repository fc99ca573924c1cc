"""Typed engine errors — the reference's error taxonomy
(``src/utils/error.rs``) re-shaped for the batch engine.

The reference's FetchError/ParseError/CrawlerError enums are
crawler-centric (HTTP fetch/parse — N/A over parquet input), but their
surface carries over: every typed error answers ``is_recoverable()``
(drives the retry harness in ``utilities.with_retry``) and
``localized_desc()`` (the i18n catalog key, ``error.rs:101-131``).
Each class also subclasses the builtin exception callers already catch
(KeyError, ValueError, FileNotFoundError), so adopting the taxonomy
never breaks existing ``except`` clauses.
"""

from __future__ import annotations

from baram_ray.i18n import t


class EngineError(Exception):
    """Base: unrecoverable by default; i18n key in ``i18n_key``."""

    i18n_key: str = ""
    recoverable: bool = False

    def is_recoverable(self) -> bool:
        return self.recoverable

    def localized_desc(self) -> str:
        return t(self.i18n_key, **getattr(self, "params", {}))


class IndexNotFound(EngineError, FileNotFoundError):
    """No index at the given path."""

    i18n_key = "errors.index.not_found"

    def __init__(self, path: str):
        super().__init__(f"Index not found: {path}")
        self.params = {"path": path}


class UnknownFilterColumn(EngineError, KeyError):
    """A filter references a metadata column the index did not keep."""

    i18n_key = "errors.index.unknown_filter"

    def __init__(self, column: str, detail: str = ""):
        super().__init__(detail or f"unknown filter column {column!r}")
        self.params = {"column": column}


class UnknownFormat(EngineError, ValueError):
    """Parse-dispatch fell through every known format (ParseError::
    UnknownFormat)."""

    i18n_key = "errors.parse.unknown_format"


class DecodeFailed(EngineError, ValueError):
    """Content bytes could not be decoded (FetchError::Decode);
    recoverable=False — bad bytes stay bad."""

    i18n_key = "errors.fetch.decode_error"


class LlmParseFailed(EngineError):
    """LLM response unparseable (reference ontology error); recoverable —
    a regenerate may produce valid output."""

    i18n_key = "errors.llm.response_parse_failed"
    recoverable = True
