"""The reference query set (FIXTURES.md §2) — fixed, deterministic.

Covers: common single term, rare/df=1 term, multi-term, identifier forms
(snake/camel/dotted), CJK bigram path, zero-hit, k edge cases, tie-score
cases (duplicate-content docs ⇒ identical scores ⇒ doc_id-asc tie-break).
"""

from __future__ import annotations

QUERY_SET: list[dict] = [
    {"query_id": 0, "text": "import", "k": 10},
    {"query_id": 1, "text": "def", "k": 10},
    {"query_id": 2, "text": "the", "k": 10},                      # head term
    {"query_id": 3, "text": "def tokenize batch", "k": 10},
    {"query_id": 4, "text": "parse token index", "k": 10},
    {"query_id": 5, "text": "snake_case_name", "k": 10},
    {"query_id": 6, "text": "camelCaseName", "k": 10},
    {"query_id": 7, "text": "pkg.mod.Class", "k": 10},
    {"query_id": 8, "text": "한국어 주석", "k": 10},                # CJK bigrams
    {"query_id": 9, "text": "検索エンジン", "k": 10},
    {"query_id": 10, "text": "qqqxplughz zyzzyvaq", "k": 10},    # zero hits
    {"query_id": 11, "text": "import", "k": 1},
    {"query_id": 12, "text": "import", "k": 100},
    {"query_id": 13, "text": "fn let mut impl", "k": 25},
    {"query_id": 14, "text": "public static void", "k": 10},
    {"query_id": 15, "text": "async await", "k": 10},
    {"query_id": 16, "text": "merge shard query score", "k": 50},
    {"query_id": 17, "text": "uniqtoken10x42", "k": 10},          # df≈1
    {"query_id": 18, "text": "parseBatch fetchCache", "k": 10},
    {"query_id": 19, "text": "usage example install", "k": 10},
]


def rare_term_query(corpus_seed: int = 42) -> str:
    return f"uniqtoken10x{corpus_seed}"
