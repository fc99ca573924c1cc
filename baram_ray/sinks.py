"""Markdown article sink (S3) — the reference's template-driven markdown
writer (``src/storage/markdown.rs`` + ``templates/article.hbs``: YAML
front-matter, mustache-style ``{{field}}`` substitution, no HTML
escaping, one file per document, custom template override).

Ray shape: a ``map_batches`` stage renders and writes each block's
documents (atomic tmp+rename per file, doc_id-derived names →
idempotent overwrite on retry) and emits a manifest row per file.
"""

from __future__ import annotations

import os
import re

import pandas as pd
import pyarrow as pa

_FIELD_RE = re.compile(r"\{\{(\w+)\}\}")

DEFAULT_TEMPLATE = """---
doc_id: {{doc_id}}
lang: {{lang}}
sha256: {{sha256}}
---

# Document {{doc_id}}

{{text}}
"""


def render_template(template: str, row: dict) -> str:
    """Mustache-style ``{{field}}`` substitution, NO escaping (the
    output is markdown, not HTML — reference register_escape_fn
    no_escape, markdown.rs:100-115). Unknown fields render empty, like
    handlebars' default."""
    return _FIELD_RE.sub(lambda m: str(row.get(m.group(1), "")), template)


class MarkdownSink:
    """map_batches UDF: render each row through the template and write
    ``{out_dir}/{doc_id}.md`` (atomic rename); returns manifest rows."""

    def __init__(self, out_dir: str, template: str | None = None,
                 id_col: str = "doc_id"):
        self.out_dir = out_dir
        self.template = template or DEFAULT_TEMPLATE
        self.id_col = id_col
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        paths, sizes = [], []
        for row in rows:
            body = render_template(self.template, row)
            path = os.path.join(self.out_dir, f"{row[self.id_col]}.md")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(body)
            os.replace(tmp, path)
            paths.append(path)
            sizes.append(len(body))
        return pa.table({
            "path": pa.array(paths, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
        })


def write_markdown(ds, out_dir: str, template: str | None = None,
                   id_col: str = "doc_id"):
    """Dataset[(doc_id, ...)] → one markdown file per document + a
    manifest Dataset (path, n_bytes)."""
    return ds.map_batches(MarkdownSink(out_dir, template, id_col),
                          batch_format="pyarrow")
