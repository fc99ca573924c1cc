"""Common helpers — the reference's ``utils`` module
(``src/utils/mod.rs`` + ``retry.rs``): text/filename/byte-format
utilities and the exponential-backoff retry harness.

Retry (``retry.rs:14-160``): delay for attempt *n* (1-based) is
``base · multiplier^(n−1)`` capped at ``max_delay_ms``; attempt 0 runs
immediately; the last error is re-raised once retries are exhausted.
``retry_if`` takes a predicate deciding which errors warrant a retry.
The sleeper is injectable so tests run without wall-clock waits. At the
engine level Ray already retries failed TASKS; this harness is for
in-task effects the scheduler can't see (flaky side-channel I/O, the
LLM client's HTTP calls in the reference).
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass

_WS_RE = re.compile(r"\s+")
_INVALID_FN_RE = re.compile(r'[<>:"/\\|?*]')


def decode_euc_kr(data: bytes) -> str:
    """mod.rs:15-23: EUC-KR bytes → str; raises on undecodable input."""
    try:
        return data.decode("euc-kr")
    except UnicodeDecodeError as e:
        from baram_ray.errors import DecodeFailed
        raise DecodeFailed("Failed to decode EUC-KR content") from e


def normalize_whitespace(text: str) -> str:
    """mod.rs:26-32: trim + collapse every whitespace run to one space."""
    return _WS_RE.sub(" ", text.strip())


def extract_domain(url: str) -> str:
    """mod.rs:35-42: host part of a URL; raises on no host."""
    from urllib.parse import urlparse
    host = urlparse(url).hostname
    if not host:
        raise ValueError(f"No host in URL: {url!r}")
    return host


def sanitize_filename(filename: str) -> str:
    """mod.rs:45-52: replace ``<>:"/\\|?*`` with underscores."""
    return _INVALID_FN_RE.sub("_", filename)


def truncate_text(text: str, max_len: int) -> str:
    """mod.rs:55-62: hard truncate to ``max_len`` with a ``...`` tail
    (the word-boundary variant lives in ``query/highlight.py``)."""
    if len(text) <= max_len:
        return text
    return text[:max(0, max_len - 3)] + "..."


def format_bytes(n: int) -> str:
    """mod.rs:65-80: human-readable size, two decimals, 1024 base."""
    units = ("B", "KB", "MB", "GB", "TB")
    if n == 0:
        return "0 B"
    exp = min(int(math.log(n, 1024)), len(units) - 1)
    return f"{n / 1024 ** exp:.2f} {units[exp]}"


@dataclass
class RetryConfig:
    """retry.rs:14-56 defaults."""
    max_retries: int = 3
    base_delay_ms: int = 1000
    max_delay_ms: int = 30_000
    backoff_multiplier: float = 2.0

    @classmethod
    def with_delays(cls, max_retries: int, base_delay_ms: int,
                    max_delay_ms: int) -> "RetryConfig":
        return cls(max_retries=max_retries, base_delay_ms=base_delay_ms,
                   max_delay_ms=max_delay_ms)

    def calculate_delay_ms(self, attempt: int) -> int:
        """retry.rs:58-68: 0 for attempt 0, else capped exponential."""
        if attempt == 0:
            return 0
        exponential = (self.base_delay_ms
                       * self.backoff_multiplier ** (attempt - 1))
        return min(int(exponential), self.max_delay_ms)


def with_retry(config: RetryConfig, operation, *,
               should_retry=None, sleep=time.sleep):
    """retry.rs:102-160 (+ the ``retry_if`` variant via
    ``should_retry``): run ``operation()`` up to ``max_retries + 1``
    times with exponential backoff; re-raise the last error when
    exhausted or when ``should_retry(err)`` says stop."""
    last_error: Exception | None = None
    for attempt in range(config.max_retries + 1):
        if attempt > 0:
            sleep(config.calculate_delay_ms(attempt) / 1000.0)
        try:
            return operation()
        except Exception as e:                    # noqa: BLE001
            if should_retry is not None and not should_retry(e):
                raise
            last_error = e
    assert last_error is not None
    raise last_error
