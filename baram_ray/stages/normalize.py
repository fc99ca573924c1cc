"""First pipeline stage: identity + invariant + forward index.

Mirrors the reference's ingest semantics:

- ``sha256`` column = lowercase-hex SHA-256 of the raw content bytes — the
  per-row integrity invariant (reference ``compute_hash``,
  ``src/models.rs:32-36``, asserted 64-char hex at ``:255-263``). Computed
  on the ORIGINAL content, before any normalization, and carried through
  every later stage.
- ``doc_id``  = deterministic dense-enough int64 identity from the natural
  key (reference ``id() = "{oid}_{aid}"``, ``src/models.rs:27-29``): the
  low 63 bits of sha1 over the null-joined key columns. Hash-based ids are
  uniform, which the index build exploits for range-sharding (doc_id
  high bits = shard) without a global sort.
- per-field token lists + lengths (the *forward index*): tokenization
  happens exactly once here; every downstream stage (docs table, postings,
  doc-length stats) is a projection/explosion of this output. This is the
  Ray analogue of the reference's parse stage feeding both storage and the
  indexer (``src/commands/index.rs:196-260``).

Stateless ``map_batches`` function — pure, no Ray API use inside.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from baram_ray.tokenizer import term_counts, term_positions


def derive_doc_id(*key_parts: str) -> int:
    """Deterministic 63-bit doc id from the natural key."""
    h = hashlib.sha1("\x00".join(key_parts).encode("utf-8", "surrogatepass")).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()


class NormalizeTokenize:
    """map_batches UDF: add ``doc_id`` + ``sha256``, tokenize each field.

    Parameters
    ----------
    fields:   text columns to analyze (each becomes a searchable field).
    id_cols:  natural-key columns for doc_id derivation; ignored when the
              input already has an int64 ``doc_id`` column.
    keep:     metadata columns to carry through (lang/repo/path/...).
    sha_col:  the column whose sha256 is the invariant (default: first field).
    """

    def __init__(self, fields: list[str], id_cols: list[str], keep: list[str],
                 sha_col: str | None = None, positions: bool = False):
        self.fields = fields
        self.id_cols = id_cols
        self.keep = keep
        self.sha_col = sha_col or fields[0]
        # positional forward index: adds {f}__pos (flat int32 positions,
        # split by {f}__tfs) — see tokenizer.term_positions for semantics
        self.positions = positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if "doc_id" in batch.column_names:
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            key_arrays = [batch[c].to_pylist() for c in self.id_cols]
            doc_ids = np.fromiter(
                (derive_doc_id(*parts) for parts in zip(*key_arrays)),
                dtype=np.int64, count=n)

        content = batch[self.sha_col].to_pylist()
        shas = [sha256_hex(c or "") for c in content]

        cols: dict[str, pa.Array] = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sha256": pa.array(shas, pa.string()),
        }
        for k in self.keep:
            cols[k] = batch[k]

        for f in self.fields:
            texts = content if f == self.sha_col else batch[f].to_pylist()
            terms_col, tfs_col, lens = [], [], np.empty(n, dtype=np.int64)
            pos_col = [] if self.positions else None
            for i, t in enumerate(texts):
                if self.positions:
                    terms, tfs, flat = term_positions(t or "")
                    terms_col.append(terms)
                    tfs_col.append(tfs)
                    pos_col.append(flat)
                    lens[i] = sum(tfs)
                else:
                    tc = term_counts(t or "")
                    terms_col.append(list(tc.keys()))
                    tfs_col.append(list(tc.values()))
                    lens[i] = sum(tc.values())
            cols[f"{f}__len"] = pa.array(lens, pa.int64())
            cols[f"{f}__terms"] = pa.array(terms_col, pa.list_(pa.string()))
            cols[f"{f}__tfs"] = pa.array(tfs_col, pa.list_(pa.int32()))
            if self.positions:
                cols[f"{f}__pos"] = pa.array(pos_col, pa.list_(pa.int32()))
        return pa.table(cols)
