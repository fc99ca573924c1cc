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


# ------------------------------------------------------------------ #
# resumable partitioned parquet export
# ------------------------------------------------------------------ #

def export_partitioned(ds, out_dir: str, partition_col: str,
                       resume: bool = True) -> pd.DataFrame:
    """Partitioned parquet export with per-partition resume — the
    "resumable output" contract at scale: one directory per partition
    value, data written to a tmp file then atomically renamed, a JSON
    done-marker (row count) written last. A re-run skips every marked
    partition BEFORE the exchange (their rows never shuffle), so a
    failed run resumes from the unfinished partitions only.

    Scale shape: ONE hash exchange on the partition column co-locates
    each partition's rows; the reduce task writes its partitions'
    files as a side effect and emits manifest rows. Returns the FULL
    manifest (written + previously-done partitions, read from their
    markers) sorted by partition value.
    """
    import glob as _glob
    import json

    from baram_ray.util import grouped_map

    os.makedirs(out_dir, exist_ok=True)
    done: dict[str, int] = {}
    if resume:
        for mp in _glob.glob(os.path.join(out_dir, "*", "_DONE.json")):
            with open(mp) as f:
                m = json.load(f)
            done[str(m["partition"])] = int(m["n_rows"])

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        if not done:
            return df
        return df[~df[partition_col].astype(str).isin(done)]

    def write_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        vals, counts = [], []
        for v, g in bucket.groupby(partition_col, sort=False):
            pdir = os.path.join(out_dir, f"{partition_col}={v}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, ".part-0.parquet.tmp")
            dst = os.path.join(pdir, "part-0.parquet")
            pq.write_table(pa.Table.from_pandas(
                g.reset_index(drop=True), preserve_index=False), tmp)
            os.replace(tmp, dst)            # atomic: data before marker
            mtmp = os.path.join(pdir, "._DONE.json.tmp")
            with open(mtmp, "w") as f:
                json.dump({"partition": str(v), "n_rows": int(len(g))}, f)
            os.replace(mtmp, os.path.join(pdir, "_DONE.json"))
            vals.append(str(v))
            counts.append(len(g))
        return pd.DataFrame({"partition": vals,
                             "n_rows": pd.array(counts, dtype="int64"),
                             "written": [True] * len(vals)})

    filtered = ds.map_batches(prefilter, batch_format="pandas")
    manifest = grouped_map(filtered, [partition_col], write_bucket,
                           num_buckets=8).to_pandas()
    skipped = pd.DataFrame({
        "partition": list(done.keys()),
        "n_rows": pd.array(list(done.values()), dtype="int64"),
        "written": [False] * len(done),
    })
    out = pd.concat([manifest, skipped], ignore_index=True)
    if len(out.columns) == 0:
        out = pd.DataFrame({"partition": pd.Series(dtype="object"),
                            "n_rows": pd.Series(dtype="int64"),
                            "written": pd.Series(dtype="bool")})
    return out.sort_values("partition", kind="stable") \
              .reset_index(drop=True)
