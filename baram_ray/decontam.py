"""Benchmark decontamination — flag training documents that contain
any token n-gram from a (small) benchmark/eval probe set.

The standard shape at 100 TB: the benchmark side is tiny (eval suites
are a few MB even when the corpus is 100 TB), so it is broadcast once
(`ray.put`) and every `map_batches` task streams its documents against
the resident gram set — no shuffle, no join, no driver loop over the
corpus. Matching is EXACT token-sequence equality (n consecutive
whitespace tokens), the semantics used by the published decontamination
recipes (GPT-3 appendix C / PaLM: 8-13-gram overlap), which makes it
SQL-expressible: the DuckDB oracle unnests every doc's n-grams and
semi-joins the benchmark grams (`pipelines/oracles.py::doc_decontam`).

Reference analogue: the reference has no decontamination operator; this
is part of the training-data suite layered on the same corpus
(dedup/quality/sampling siblings in ``baram_ray/dedup.py``,
``stages/text.py``, ``sampling.py``).
"""

from __future__ import annotations

import pyarrow as pa

import ray


def ngrams_of(tokens: list[str], n: int) -> list[str]:
    """All n-token grams of a token list as space-joined strings."""
    return [" ".join(tokens[i:i + n])
            for i in range(len(tokens) - n + 1)]


def benchmark_grams(texts: list[str], n: int = 8,
                    start: int = 3, count: int = 1) -> set[str]:
    """Build a probe-gram set from benchmark texts: ``count`` grams per
    text starting at token offset ``start`` (0-based). Real pipelines
    take every gram of every benchmark doc; taking a fixed slice keeps
    the synthetic probe set small and deterministic."""
    grams: set[str] = set()
    for t in texts:
        toks = t.split()
        for i in range(start, min(start + count, len(toks) - n + 1)):
            grams.add(" ".join(toks[i:i + n]))
    return grams


def decontaminate(ds, grams: set[str], n: int = 8, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  keep: str = "contaminated"):
    """Flag (or drop) documents containing any probe gram.

    ``keep='contaminated'`` returns the flagged doc ids (audit view);
    ``keep='clean'`` returns the surviving rows (the actual filter a
    training pipeline applies). The gram set rides a single object-store
    reference: `ray.put` once, zero-copy view in every task.
    """
    grams_ref = ray.put(grams)

    def flag(batch: pa.Table) -> pa.Table:
        probe = ray.get(grams_ref)
        hits = []
        for t in batch[text_col].to_pylist():
            toks = t.split()
            hits.append(any(" ".join(toks[i:i + n]) in probe
                            for i in range(len(toks) - n + 1)))
        mask = pa.array(hits, pa.bool_())
        if keep == "clean":
            import pyarrow.compute as pc
            return batch.filter(pc.invert(mask))
        return batch.filter(mask).select([id_col])

    return ds.map_batches(flag, batch_format="pyarrow")
