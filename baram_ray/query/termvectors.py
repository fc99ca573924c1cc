"""Term vectors — the OpenSearch ``_termvectors`` API (per-document
term statistics; the reference's backend serves it from the same
stored per-doc term lists). This engine already materializes exactly
that shape once at build time: the forward store's
``{field}__terms`` / ``{field}__tfs`` list columns
(``index/build.py`` forward stage). Serving a doc's vector is a
predicate-pushdown read of its forward row (DuckDB doc_id row-group
pruning — never the corpus) plus an optional termdict join for
corpus-wide df/cf.

Tombstoned (deleted-but-unpurged) docs still resolve here until
``purge`` rewrites the forward store — same contract as the
reference's segment-level deletes.
"""

from __future__ import annotations

import os

import pandas as pd


def term_vectors(index_dir: str, doc_ids: list[int],
                 field: str = "text",
                 with_stats: bool = True) -> pd.DataFrame:
    """(doc_id, term, term_freq[, doc_freq, total_freq]) rows for the
    requested docs, sorted (doc_id, term). Missing doc_ids simply
    yield no rows (the OpenSearch found:false analogue)."""
    import duckdb

    if not doc_ids:
        cols = {"doc_id": pd.array([], dtype="int64"),
                "term": pd.array([], dtype=object),
                "term_freq": pd.array([], dtype="int64")}
        if with_stats:
            cols["doc_freq"] = pd.array([], dtype="int64")
            cols["total_freq"] = pd.array([], dtype="int64")
        return pd.DataFrame(cols)
    fwd = os.path.join(index_dir, "forward", "**", "*.parquet")
    td = os.path.join(index_dir, "termdict", "**", "*.parquet")
    ids = ",".join(str(int(d)) for d in doc_ids)
    con = duckdb.connect()
    try:
        base = f"""
            SELECT doc_id,
                   unnest("{field}__terms") AS term,
                   CAST(unnest("{field}__tfs") AS BIGINT)
                       AS term_freq
            FROM read_parquet('{fwd}')
            WHERE doc_id IN ({ids})"""
        if with_stats:
            q = f"""
                SELECT v.doc_id, v.term, v.term_freq,
                       CAST(t.df AS BIGINT) AS doc_freq,
                       CAST(t.cf AS BIGINT) AS total_freq
                FROM ({base}) v
                JOIN read_parquet('{td}') t
                  ON t.term = v.term AND t.field = '{field}'
                ORDER BY v.doc_id, v.term"""
        else:
            q = f"SELECT * FROM ({base}) ORDER BY doc_id, term"
        return con.execute(q).fetchdf()
    finally:
        con.close()
