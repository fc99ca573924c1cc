"""Markdown corpus source (S1/S2) — the reference's index-input parser
(``src/commands/index.rs:402-520`` ``parse_markdown_to_document``)
re-expressed as a Ray Data read + batch parse:

- YAML front-matter between the FIRST TWO ``---`` lines only (later
  ``---`` lines are content separators), ``key: value`` pairs with
  whitespace + double-quote trimming;
- title = first ``# `` heading, ``"Untitled"`` fallback;
- body  = all non-empty non-front-matter lines joined with ``\\n``;
- id    = ``oid_aid`` from front-matter, else filename stem split on
  the first ``_`` (``oid, aid``), else ``oid="000", aid=stem``.

Ray shape: ``ray.data.read_binary_files(include_paths=True)`` streams
file blocks; parsing is a vectorized-batch ``map_batches`` (pure
string slicing, no per-file task). Binary read (not text) keeps byte
fidelity until decode, matching the utf-8-lossy read of the reference.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data


def parse_markdown(content: str, filename_stem: str) -> dict:
    """One document's fields from its markdown text — the reference's
    parse rules, bit-for-bit (index.rs:402-478)."""
    lines = content.splitlines()

    title = next((ln[2:] for ln in lines if ln.startswith("# ")),
                 "Untitled")

    meta: dict[str, str] = {}
    delim = 0
    in_meta = False
    body: list[str] = []
    for ln in lines:
        if ln.startswith("---"):
            if delim < 2:
                delim += 1
                in_meta = delim == 1
                continue
            # past the front-matter: plain content separator line
        if in_meta:
            if ":" in ln:
                k, v = ln.split(":", 1)
                meta[k.strip()] = v.strip().strip('"')
        elif ln:
            body.append(ln)

    oid = meta.get("oid", "")
    aid = meta.get("aid", "")
    if not oid or not aid:
        stem = filename_stem or "unknown"
        if "_" in stem:
            oid, aid = stem.split("_", 1)
        else:
            oid, aid = "000", stem

    return {
        "id": f"{oid}_{aid}",
        "oid": oid,
        "aid": aid,
        "title": title,
        "content": "\n".join(body),
        "category": meta.get("category", ""),
        "publisher": meta.get("publisher", ""),
        "author": meta.get("author", ""),
        "url": meta.get("url", ""),
        "published_at": meta.get("published_at", meta.get("date", "")),
        "meta": meta,
    }


class _ParseStage:
    """map_batches UDF over (bytes, path) file blocks → document rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in
                                ("id", "oid", "aid", "title", "content",
                                 "category", "publisher", "author", "url",
                                 "published_at", "path")}
        for raw, path in zip(batch["bytes"].to_pylist(),
                             batch["path"].to_pylist()):
            stem = os.path.splitext(os.path.basename(path))[0]
            doc = parse_markdown(raw.decode("utf-8", errors="replace"),
                                 stem)
            for k in out:
                if k == "path":
                    out["path"].append(path)
                else:
                    out[k].append(doc[k])
        return pa.table({k: pa.array(v, pa.string())
                         for k, v in out.items()})


def read_markdown_dir(path: str, *, override_num_blocks: int | None = None):
    """Directory of ``.md`` articles → Dataset[(id, oid, aid, title,
    content, category, publisher, author, url, published_at, path)],
    all string-typed (front-matter is untyped text in the reference
    too). Downstream stages cast/derive what they need (doc_id ints,
    date coercion via the M13 stage)."""
    files = ray.data.read_binary_files(
        path, include_paths=True, file_extensions=["md"],
        override_num_blocks=override_num_blocks)
    return files.map_batches(_ParseStage(), batch_format="pyarrow")
