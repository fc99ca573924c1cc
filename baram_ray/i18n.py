"""Internationalization — the reference's ``i18n`` module
(``src/i18n/mod.rs`` + ``locales/{en,ko,zh}/*.yml``) for this engine's
user-facing CLI/error messages.

Same surface: ``set_locale`` / ``current_locale`` / ``init_from_env``
(reads ``BARAM_LANG``; en default), locale normalization (``ko-KR``,
``ko_KR``, ``korean`` → ``ko``; same for en/zh; unknown → en,
``mod.rs:77-93``), and ``t(key, **args)`` translation with ``%{name}``
interpolation (rust-i18n syntax). Lookup falls back locale → en → the
key itself (rust-i18n's missing-key behavior). The catalog carries THIS
engine's messages (build/search/delete lifecycle) rather than the
reference's crawler strings — the mechanism is the parity target, the
crawler itself is N/A here.
"""

from __future__ import annotations

import os
import re

_SUPPORTED = ("en", "ko", "zh")

# key → {locale: template}; %{name} interpolation per rust-i18n
_CATALOG: dict[str, dict[str, str]] = {
    "cli.app.starting": {
        "en": "baram-ray engine starting",
        "ko": "baram-ray 엔진 시작",
        "zh": "baram-ray 引擎启动",
    },
    "cli.app.completed": {
        "en": "baram-ray completed successfully",
        "ko": "baram-ray가 성공적으로 완료되었습니다",
        "zh": "baram-ray 成功完成",
    },
    "cli.build.starting": {
        "en": "Building index: %{input}",
        "ko": "인덱스 구축 시작: %{input}",
    },
    "cli.build.completed": {
        "en": "Indexed %{count} documents in %{seconds}s",
        "ko": "%{seconds}초 동안 문서 %{count}건 인덱싱 완료",
    },
    "cli.build.resumed": {
        "en": "Resumed from checkpoint: %{stages} stages skipped",
        "ko": "체크포인트에서 재개: %{stages}개 단계 건너뜀",
    },
    "cli.search.results": {
        "en": "Found %{count} results for '%{query}'",
        "ko": "'%{query}' 검색 결과 %{count}건",
    },
    "cli.delete.tombstoned": {
        "en": "Tombstoned %{count} documents",
        "ko": "문서 %{count}건 삭제 표시",
    },
    "cli.purge.completed": {
        "en": "Purged %{count} documents from postings",
        "ko": "포스팅에서 문서 %{count}건 제거 완료",
    },
    "errors.index.not_found": {
        "en": "Index not found: %{path}",
        "ko": "인덱스를 찾을 수 없습니다: %{path}",
    },
    "errors.index.unknown_filter": {
        "en": "Unknown filter column: %{column}",
        "ko": "알 수 없는 필터 컬럼: %{column}",
    },
    "errors.fetch.decode_error": {
        "en": "Decoding error",
        "ko": "디코딩 오류",
    },
    "errors.parse.unknown_format": {
        "en": "Unknown or unsupported format",
        "ko": "알 수 없거나 지원되지 않는 형식",
    },
    "errors.llm.response_parse_failed": {
        "en": "LLM response parse failed",
        "ko": "LLM 응답 파싱 실패",
    },
}

_current: str | None = None
_PARAM_RE = re.compile(r"%\{(\w+)\}")


def normalize_locale(locale: str) -> str:
    """mod.rs:77-93: ko-KR/ko_KR/korean → ko, same for en/zh; unknown →
    en."""
    lower = locale.lower()
    if lower.startswith("ko") or lower == "korean":
        return "ko"
    if lower.startswith("zh") or lower == "chinese":
        return "zh"
    return "en"


def set_locale(locale: str) -> None:
    global _current
    _current = normalize_locale(locale)


def current_locale() -> str:
    return _current if _current is not None else "en"


def init_from_env() -> None:
    """mod.rs:72-75: read BARAM_LANG; fall back to English."""
    set_locale(os.environ.get("BARAM_LANG", "en"))


def t(key: str, **args) -> str:
    """Translate ``key`` in the current locale with ``%{name}``
    interpolation; falls back locale → en → the key itself."""
    entry = _CATALOG.get(key)
    if entry is None:
        return key
    template = entry.get(current_locale()) or entry.get("en") or key
    return _PARAM_RE.sub(
        lambda m: str(args.get(m.group(1), m.group(0))), template)
