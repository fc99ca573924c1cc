"""Deterministic synthetic source-code corpus — the BASELINE.json input table.

Generates a Parquet table with schema exactly
``(repo: string, path: string, commit: string, lang: string, content: string)``
(BASELINE.json ``input_hint``), seeded and wall-clock-free so every run and
every scale factor is reproducible (FIXTURES.md §1):

- a few hot repos (per-repo skew), zipfian language mix;
- content drawn from per-language keyword pools + a zipfian identifier
  vocabulary (head-term skew: ``the``/``import``/``def`` appear in almost
  every file) + occasional CJK comment lines (exercises the bigram path)
  + rare unique tokens (df=1) + ~1% exact-duplicate rows (dedup path)
  + a few empty/whitespace-only rows (``has_content`` filter, reference
  ``src/parser/sanitize.rs:215-217``).

The ``commit`` column is the 40-hex sha1 of ``{repo}/{path}`` — stable per
file, mirroring the reference's content-derived identities
(``src/models.rs:27-36``).
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ["python", "rust", "java", "go", "js", "md"]
_LANG_W = [8, 4, 3, 2, 2, 1]  # zipf-ish language mix
_EXT = {"python": "py", "rust": "rs", "java": "java", "go": "go", "js": "js", "md": "md"}

_KEYWORDS = {
    "python": ["def", "class", "import", "from", "return", "self", "if", "else",
               "for", "in", "try", "except", "with", "lambda", "yield", "None"],
    "rust": ["fn", "let", "mut", "impl", "struct", "enum", "match", "pub", "use",
             "mod", "trait", "async", "await", "Result", "Option"],
    "java": ["public", "private", "static", "void", "class", "interface", "new",
             "return", "extends", "implements", "final", "throws"],
    "go": ["func", "package", "import", "var", "const", "type", "struct",
           "interface", "go", "defer", "chan", "range"],
    "js": ["function", "const", "let", "var", "return", "class", "import",
           "export", "async", "await", "this", "new"],
    "md": ["the", "a", "of", "and", "to", "in", "is", "for", "this", "that",
           "with", "usage", "example", "install"],
}

_CJK_COMMENTS = [
    "한국어 주석 테스트 코드",
    "데이터 처리 엔진 구현",
    "検索エンジンの実装",
    "倒排索引构建模块",
    "토큰화 및 색인 파이프라인",
]


def _vocab(n: int = 5000) -> list[str]:
    """Deterministic identifier vocabulary, mixed casing styles."""
    rng = random.Random(42_4242)
    roots = ["parse", "token", "index", "query", "score", "batch", "shard",
             "merge", "fetch", "cache", "store", "block", "doc", "term",
             "hash", "node", "tree", "list", "map", "util", "config", "run"]
    styles = ["snake", "camel", "pascal", "plain"]
    out = []
    for i in range(n):
        a, b = rng.choice(roots), rng.choice(roots)
        style = styles[i % 4]
        if style == "snake":
            out.append(f"{a}_{b}_{i % 97}")
        elif style == "camel":
            out.append(f"{a}{b.capitalize()}{i % 89}")
        elif style == "pascal":
            out.append(f"{a.capitalize()}{b.capitalize()}")
        else:
            out.append(f"{a}{i % 83}")
    return out


def _zipf_pick(rng: random.Random, items: list[str]) -> str:
    # inverse-CDF zipf over ranked items (s≈1.1): cheap + deterministic
    u = rng.random()
    idx = int(len(items) * (u ** 3.2))  # heavy head
    return items[min(idx, len(items) - 1)]


def generate_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    rng = random.Random(seed)
    vocab = _vocab()
    repos, paths, commits, langs, contents = [], [], [], [], []
    modules = ["core", "io", "net", "index", "query", "util", "api", "cli"]

    prev: list[tuple[str, str, str, str, str]] = []
    for i in range(n_rows):
        # ~1% exact duplicates of an earlier row (same content, new path)
        if prev and rng.random() < 0.01:
            r, p, c, lg, ct = prev[rng.randrange(len(prev))]
            p = f"{p}.dup{i}"
            commit = hashlib.sha1(f"{r}/{p}".encode()).hexdigest()
            repos.append(r); paths.append(p); commits.append(commit)
            langs.append(lg); contents.append(ct)
            continue
        # ~2% NEAR-duplicates: copy an earlier doc, perturb a few tokens
        # (exercises MinHash-LSH / SimHash / n-gram Jaccard paths)
        if prev and rng.random() < 0.02:
            r, p, c, lg, ct = prev[rng.randrange(len(prev))]
            words = ct.split()
            if len(words) > 20:
                for _ in range(max(1, len(words) // 50)):
                    words[rng.randrange(len(words))] = _zipf_pick(rng, vocab)
                ct = " ".join(words)
            p = f"{p}.near{i}"
            commit = hashlib.sha1(f"{r}/{p}".encode()).hexdigest()
            repos.append(r); paths.append(p); commits.append(commit)
            langs.append(lg); contents.append(ct)
            continue
        repo = f"org{i % 7}/repo{i % 23}"
        lang = rng.choices(_LANGS, weights=_LANG_W)[0]
        name = _zipf_pick(rng, vocab)
        path = f"src/{rng.choice(modules)}/{name}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        # ~0.5% empty / whitespace-only rows
        if rng.random() < 0.005:
            content = rng.choice(["", "   ", "\n\n\t "])
        else:
            n_lines = rng.randint(5, 60)
            kw = _KEYWORDS[lang]
            lines = []
            for _ in range(n_lines):
                n_tok = rng.randint(3, 10)
                toks = [rng.choice(kw) if rng.random() < 0.4 else _zipf_pick(rng, vocab)
                        for _ in range(n_tok)]
                lines.append(" ".join(toks))
            if rng.random() < 0.08:
                lines.append("# " + rng.choice(_CJK_COMMENTS))
            if rng.random() < 0.02:
                lines.append(f"uniqtoken{i}x{seed}")  # df=1 terms
            content = "\n".join(lines)
        repos.append(repo); paths.append(path); commits.append(commit)
        langs.append(lang); contents.append(content)
        if len(prev) < 200:
            prev.append((repo, path, commit, lang, content))

    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def corpus_parquet(n_rows: int, seed: int = 42, cache_dir: str = "/tmp/baram_corpus") -> str:
    """Write (once) and return the path of the corpus parquet for n_rows."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"code_v3_{n_rows}_{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        # bounded row groups: a single-row-group file reads serially
        # in any engine — row-group count is the read parallelism
        pq.write_table(generate_corpus(n_rows, seed), tmp,
                       row_group_size=8192)
        os.replace(tmp, path)  # atomic, reference checkpoint idiom src/storage/checkpoint.rs:229-248
    return path


def generate_vectors(n_rows: int, dim: int = 64, n_clusters: int = 64,
                     seed: int = 7, sigma: float | None = None) -> pa.Table:
    """Synthetic clustered embedding table (vec_id, embedding) for ANN
    recall/latency benchmarks: rows scatter around ``n_clusters``
    unit-norm Gaussian centers. ``sigma`` defaults to 0.5/√dim so the
    noise vector's norm is ~0.5 of the center's — tight real-embedding-
    like clusters an IVF coarse quantizer can actually learn (a σ whose
    noise norm exceeds 1 drowns the centers and measures nothing).
    Deterministic per (n_rows, dim, n_clusters, seed, sigma)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    if sigma is None:
        sigma = 0.5 / dim ** 0.5
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n_rows)
    vecs = centers[assign] + sigma * rng.standard_normal((n_rows, dim))
    return pa.table({
        "vec_id": pa.array(np.arange(n_rows, dtype=np.int64), pa.int64()),
        "embedding": pa.array([v.tolist() for v in
                               vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
    })


def vectors_parquet(n_rows: int, dim: int = 64, n_clusters: int = 64,
                    seed: int = 7, sigma: float | None = None,
                    cache_dir: str = "/tmp/baram_corpus") -> str:
    """Write (once) and return the clustered-vector parquet path."""
    os.makedirs(cache_dir, exist_ok=True)
    stag = "d" if sigma is None else f"{sigma:g}"
    path = os.path.join(
        cache_dir, f"vecs_v2_{n_rows}_{dim}_{n_clusters}_{seed}_{stag}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_vectors(n_rows, dim, n_clusters, seed, sigma),
                       tmp, row_group_size=8192)
        os.replace(tmp, path)
    return path
