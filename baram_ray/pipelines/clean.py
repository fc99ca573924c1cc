"""``clean_corpus`` — the composed end-to-end training-data prep
pipeline: the chain a 100-TB pretraining run streams its raw corpus
through before tokenization. One wide per-row scan computes every local
signal; the only exchanges are the two dedup families and the final
semi-joins:

  1. sanitize (M1/M2 chain) + drop empty docs
  2. quality + repetition + decontamination flags — ONE ``map_batches``
     over the sanitized text (no extra scans; the decontam probe set is
     a broadcast ref)
  3. exact content dedup: sha256 first-wins (D2, one bucketed exchange)
  4. MinHash-LSH near-dup clusters: keep only component representatives
     (min-doc_id first-wins, fully distributed verification +
     label propagation)
  5. survivors = flag-passing docs ∩ exact winners ∩ near-dup reps
     (two hash semi-joins)
  6. deterministic train/val/test split (pure key-hash — resharding
     never re-rolls)

Every stage streams: nothing corpus-sized ever lands on the driver.
Filters are tested by invariants (survivors ⊆ input, zero duplicate
sha256 among survivors, zero contaminated survivors, split exclusivity)
— see ``tests/test_clean.py``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from baram_ray.pipelines.util import read_table

QUALITY_MIN = 0.25
TOP2_MAX = 0.20
DECONTAM_N = 8
NEARDUP_T = 0.7


def _flag_stage(grams_ref, n: int):
    """Per-row signals in one pass: sha256, quality score, top-2-gram
    repetition fraction, benchmark contamination."""

    def flags(batch: pa.Table) -> pa.Table:
        import ray as _ray

        from baram_ray.stages.text import QualityStage
        probe = _ray.get(grams_ref)
        q = QualityStage()
        texts = batch["clean_text"].to_pylist()
        shas, quality, top2, contam = [], [], [], []
        from collections import Counter
        for t in texts:
            t = t or ""
            shas.append(hashlib.sha256(t.encode()).hexdigest())
            quality.append(q.score_one(t)["quality"])
            toks = t.split()
            pairs = list(zip(toks, toks[1:]))
            top2.append(max(Counter(pairs).values()) / len(pairs)
                        if pairs else 0.0)
            contam.append(any(" ".join(toks[i:i + n]) in probe
                              for i in range(len(toks) - n + 1)))
        return (batch
                .append_column("sha256", pa.array(shas, pa.string()))
                .append_column("quality", pa.array(quality, pa.float64()))
                .append_column("top2_frac", pa.array(top2, pa.float64()))
                .append_column("contaminated",
                               pa.array(contam, pa.bool_())))

    return flags


def clean_corpus(sf_dir: str, *,
                 quality_min: float = QUALITY_MIN,
                 top2_max: float = TOP2_MAX,
                 neardup_threshold: float = NEARDUP_T,
                 lm_max_ppl: float | None = None,
                 splits: dict[str, float] | None = None):
    """Run the full prep chain over the documents table; returns the
    surviving rows ``(doc_id, lang, source, quality, split)``.

    ``lm_max_ppl``: optional CCNet-style LM filter — drop docs whose
    corpus-bigram-LM perplexity (``doc_lm_score``) exceeds the
    threshold (one extra semi-join; the LM trains on the same pass's
    corpus, nothing corpus-sized on the driver)."""
    import pyarrow.compute as pc

    import ray

    from baram_ray import decontam, dedup
    from baram_ray.joins import hash_join
    from baram_ray.sampling import hash_split
    from baram_ray.stages.text import SanitizeStage
    from baram_ray.util import grouped_agg

    # --- 1. sanitize + drop empties -------------------------------- #
    ds = read_table(sf_dir, "documents",
                    ["doc_id", "text", "lang", "source"])
    san = (ds.map_batches(SanitizeStage(), batch_format="pyarrow")
             .map_batches(lambda b: b.filter(b["has_content"])
                          .drop_columns(["text", "has_content"]),
                          batch_format="pyarrow"))

    # --- 2. one-pass per-row signals ------------------------------- #
    # decontam probe set: a REAL deployment reads a bounded benchmark
    # fixture; this synthesized stand-in (every 50th doc) must be
    # bounded too — an id cutoff caps the driver pull at PROBE_MAX
    # docs no matter the corpus size (deterministic and reshard-stable,
    # unlike .limit() whose row choice depends on block order). At
    # 100 TB the old unbounded pull was corpus/50 on the driver.
    PROBE_MAX = 4096

    def pick(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        return b.filter(pa.array((ids % 50 == 0)
                                 & (ids < 50 * PROBE_MAX)))

    bench = (read_table(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(pick, batch_format="pyarrow").to_pandas())
    grams = decontam.benchmark_grams(bench["text"].tolist(),
                                     n=DECONTAM_N, start=3, count=1)
    flagged = san.map_batches(_flag_stage(ray.put(grams), DECONTAM_N),
                              batch_format="pyarrow")

    # --- 3. exact dedup winners (sha256 first-wins) ---------------- #
    winners = grouped_agg(
        flagged.select_columns(["sha256", "doc_id"]),
        ["sha256"], {"doc_id": ("doc_id", "min")}, num_buckets=32
    ).select_columns(["doc_id"])

    # --- 4. near-dup representatives ------------------------------- #
    pairs = dedup.minhash_dedup(
        san.select_columns(["doc_id", "clean_text"]), "clean_text",
        threshold=neardup_threshold)
    labels = dedup.cluster_from_pairs_ds(
        pairs, san.select_columns(["doc_id"]))
    reps = labels.map_batches(
        lambda b: b.filter(pc.equal(b["doc_id"], b["cluster"]))
                   .select(["doc_id"]),
        batch_format="pyarrow")

    # --- 5. flag filter + semi-joins ------------------------------- #
    passing = flagged.map_batches(
        lambda b: b.filter(
            pc.and_(pc.and_(pc.greater_equal(b["quality"],
                                             pa.scalar(quality_min)),
                            pc.less_equal(b["top2_frac"],
                                          pa.scalar(top2_max))),
                    pc.invert(b["contaminated"]))
        ).select(["doc_id", "lang", "source", "quality"]),
        batch_format="pyarrow")
    alive = hash_join(passing, winners, "doc_id", how="semi")
    alive = hash_join(alive, reps, "doc_id", how="semi")

    # --- 5b. optional LM-perplexity filter (CCNet-style) ------------ #
    if lm_max_ppl is not None:
        from baram_ray.pipelines.training import doc_lm_score
        keep_lm = doc_lm_score(sf_dir).map_batches(
            lambda b: b.filter(
                pc.less_equal(b["ppl"], pa.scalar(float(lm_max_ppl)))
            ).select(["doc_id"]),
            batch_format="pyarrow")
        alive = hash_join(alive, keep_lm, "doc_id", how="semi")

    # --- 6. deterministic split ------------------------------------ #
    return hash_split(alive,
                      splits or {"train": 0.8, "val": 0.1, "test": 0.1})


def clean_corpus_stats(sf_dir: str):
    """Driver-facing summary of the prep chain: per-split survivor
    counts + mean quality (rows-only check; the chain's invariants are
    pytest-asserted)."""
    import pandas as pd

    out = clean_corpus(sf_dir).to_pandas()
    g = (out.groupby("split", as_index=False)
            .agg(n=("doc_id", "size"), mean_quality=("quality", "mean")))
    g["n"] = g["n"].astype("int64")
    g["mean_quality"] = g["mean_quality"].round(6)
    return g.sort_values("split").reset_index(drop=True)
