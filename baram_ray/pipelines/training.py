"""Training-data pipeline operators exposed through the driver contract:
dedup family, similarity search, text analysis, multimodal plumbing.
"""

from __future__ import annotations

import ray.data

from baram_ray import dedup, similarity
from baram_ray.pipelines.util import ensure_cols, read_table
from baram_ray.stages.text import (
    FingerprintStage, LangIdStage, QualityStage, SanitizeStage,
)

KNN_QUERY_IDS = [0, 1, 2]
NEARDUP_COS_T = 0.35
JACCARD_N = 2
JACCARD_T = 0.5


# --------------------------- dedup family ---------------------------- #

def dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup clusters over documents (rows-only check;
    recall/precision asserted against exact Jaccard in tests). Fully
    distributed: cogroup-attached verification + min-label propagation."""
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    # signature computation is CPU-heavy per row: floor the block count
    # at the core count so a small table still fans out
    ds = read_table(sf_dir, "documents", ["doc_id", "text"],
                    min_blocks=ncpu)
    pairs = dedup.minhash_dedup(ds, "text", threshold=0.7)
    ids = read_table(sf_dir, "documents", ["doc_id"])
    return dedup.cluster_from_pairs_ds(pairs, ids)


def dedup_simhash(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.simhash_pairs(ds, "text", max_hamming=3)
    return ensure_cols(out, {"a": "int64", "b": "int64", "hamming": "int64"})


def dedup_ngram_jaccard(sf_dir: str):
    """Exact word-bigram Jaccard pairs ≥ 0.5 (SQL oracle)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.ngram_jaccard_pairs(ds, "text", n=JACCARD_N,
                                    threshold=JACCARD_T)
    return ensure_cols(out, {"a": "int64", "b": "int64",
                             "jaccard": "float64"})


# ------------------------- similarity search ------------------------- #

def sim_knn_bruteforce(sf_dir: str):
    """Exact cosine top-5 for fixed query vectors (SQL oracle; both sides
    compute in f64 — the SQL casts the float32 column to DOUBLE[] — and
    round to 6)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.brute_force_topk(ds, KNN_QUERY_IDS, k=5)


def sim_knn_lsh(sf_dir: str):
    """LSH-bucketed approximate top-5 (rows-only; recall vs brute force
    asserted in tests)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.lsh_topk(ds, KNN_QUERY_IDS, k=5)


def sim_knn_ivf(sf_dir: str):
    """IVF coarse-quantizer approximate top-5 (rows-only; recall vs
    brute force asserted in tests)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.ivf_topk(ds, KNN_QUERY_IDS, k=5)


def sim_knn_ivf_indexed(sf_dir: str):
    """Partitioned-IVF top-5 — the pruned-READ ANN shape
    (``similarity.ivf_build``: spherical-kmeans cells, parquet
    partitioned per cell; ``ivf_search`` reads ONLY the probed cells'
    files). Index built once per sf_dir under /tmp and reused; rows-only
    driver check, recall + prune-fraction asserted in tests."""
    import hashlib as _hl
    import os as _os

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    tag = _hl.sha1(_os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = f"/tmp/baram_ray_ivf/emb_{tag}"
    if not _os.path.exists(_os.path.join(idx, "meta.json")):
        similarity.ivf_build(ds, idx, n_cells=16, train_iters=4)
    _, q_vecs = similarity._collect_query_vecs(ds, KNN_QUERY_IDS)
    return similarity.ivf_search(idx, q_vecs, KNN_QUERY_IDS, k=5,
                                 nprobe=4)


def sim_knn_hnsw(sf_dir: str):
    """Sharded-HNSW graph top-5 — the graph-index ANN class the
    reference gets from OpenSearch (m=16, ef_construction=128,
    ``src/embedding/mod.rs:309-321``), rebuilt natively: one graph per
    vec_id shard built in parallel, scatter-gather search. Index built
    once per sf_dir under /tmp and reused; rows-only driver check,
    recall vs brute force + determinism asserted in tests."""
    import hashlib as _hl
    import os as _os

    from baram_ray import hnsw as _hnsw

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    tag = _hl.sha1(_os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = f"/tmp/baram_ray_hnsw/emb_{tag}"
    if not _os.path.exists(_os.path.join(idx, "meta.json")):
        _hnsw.hnsw_build(ds, idx, num_shards=4)
    _, q_vecs = similarity._collect_query_vecs(ds, KNN_QUERY_IDS)
    return _hnsw.hnsw_search(idx, q_vecs, KNN_QUERY_IDS, k=5,
                             ef_search=64)


def sim_knn_pq(sf_dir: str):
    """Product-quantized top-5 — the beyond-RAM ANN class (the
    reference's faiss config family, ``src/embedding/mod.rs:309-321``):
    m=16 uint8 codes per vector (16× compression at dim 64), ADC
    lookup-table scan of the codes parquet, exact refine of the top
    k×8 candidates against the original embeddings. Index built once
    per sf_dir under /tmp and reused; rows-only driver check, recall vs
    brute force + determinism asserted in tests."""
    import hashlib as _hl
    import os as _os

    from baram_ray import pq as _pq

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    tag = _hl.sha1(_os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = f"/tmp/baram_ray_pq/emb_{tag}"
    meta_p = _os.path.join(idx, "meta.json")
    stale = True
    if _os.path.exists(meta_p):
        import json as _json
        with open(meta_p) as f:
            stale = "partition" not in _json.load(f)
    if stale:
        import shutil as _sh
        _sh.rmtree(idx, ignore_errors=True)
        _pq.pq_build(ds, idx, m=16, train_sample=4096)
    _, q_vecs = similarity._collect_query_vecs(ds, KNN_QUERY_IDS)
    return _pq.pq_search(idx, q_vecs, KNN_QUERY_IDS, k=5,
                         refine=8, ds=ds)


def sim_neardup_pairs(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = similarity.embedding_neardup_pairs(ds, threshold=NEARDUP_COS_T)
    return ensure_cols(out, {"a": "int64", "b": "int64",
                             "cosine": "float64"})


def sim_neardup_lsh(sf_dir: str):
    """Approximate near-dup pairs via hyperplane-LSH candidates + exact
    verify (rows-only; recall vs the exact op asserted in tests)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = similarity.embedding_neardup_lsh(ds, threshold=NEARDUP_COS_T)
    return ensure_cols(out, {"a": "int64", "b": "int64",
                             "cosine": "float64"})


def sim_centroid_assign(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.assign_centroids(ds, n_centroids=8)


def doc_bpe_merges(sf_dir: str, n_merges: int = 48):
    """Distributed BPE tokenizer TRAINING over the documents corpus
    (``baram_ray/bpe.py``): one corpus pass for word counts, then the
    actor-sharded merge loop. Rows-only driver check (iterative global
    argmax has no SQL form); sharded == single-process reference
    identity asserted in tests."""
    from baram_ray.bpe import bpe_train

    ds = read_table(sf_dir, "documents", ["text"])
    return bpe_train(ds, n_merges=n_merges, min_freq=2, num_shards=4)


# ----------------- M3: format-dispatch parse chain ------------------- #

def doc_parse_dispatch(sf_dir: str):
    """M3: detect-format → parse → fallback-chain over documents
    (reference parse_with_fallback). The synthetic corpus is plain text,
    so the SQL oracle asserts the dispatcher identifies 'plain' and
    passes content through unmangled; the html/markdown/json parsers and
    the fallback order are unit-tested."""
    from baram_ray.stages.text import ParseDispatchStage
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(ParseDispatchStage("text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "format_used", "parse_ok",
                               "n_chars_out"])


# ------------------------ embedding prep (M16) ----------------------- #

def doc_embed_prep(sf_dir: str):
    """M16: '{title} {content}' concat + 512-token truncation (the
    embedder input projection; SQL oracle). `source` stands in for the
    title column on the synthetic documents table."""
    from baram_ray.stages.embed import EmbedPrepStage
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    return ds.map_batches(EmbedPrepStage("text", title_col="source"),
                          batch_format="pyarrow")


def doc_embed_vectors(sf_dir: str):
    """A1/M16: actor-pool batched 'inference' over the prepped text
    (deterministic fake encoder — no model in container; schema and
    determinism pytest-checked). Returns (doc_id, dim, norm)."""
    import numpy as np
    import pyarrow as pa

    from baram_ray.stages.embed import EMBED_BATCH, EmbedStage
    prep = doc_embed_prep(sf_dir)
    vecs = prep.map_batches(EmbedStage, concurrency=2,
                            batch_size=EMBED_BATCH,
                            batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False)
        dim = batch["dim"].to_numpy(zero_copy_only=False)
        m = vals.reshape(batch.num_rows, -1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "dim": batch["dim"],
            "norm": pa.array(np.round(np.linalg.norm(m, axis=1), 4),
                             pa.float64()),
        })

    return vecs.map_batches(project, batch_format="pyarrow")


# --------------------------- text analysis --------------------------- #

# text stages run as plain tasks (instance form): their setup (regex
# compile) is cheap, and a per-call actor pool costs seconds of spin-up;
# a trained-model variant would switch to map_batches(Cls, concurrency=N)
def text_langid(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangIdStage("text"), batch_format="pyarrow")


def text_quality(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(QualityStage("text"), batch_format="pyarrow")


def text_fingerprint(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(FingerprintStage("text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_fingerprints", "min_fp"])


def text_sanitize(sf_dir: str):
    """Sanitize-chain exercise: the synthetic corpus carries no HTML /
    entities / control chars, so (same pattern as ``text_pii``) the
    driver query DECORATES each doc with a deterministic wrapper —
    tags, a bell control char, all five entities, a zero-width space,
    runs of spaces/tabs and newlines — on BOTH sides; hash equality
    with the SQL oracle then proves every step of the chain (tag strip
    → zw → ctrl → entity decode → space collapse → line trim → newline
    collapse → trim) behaves identically."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def decorate(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        deco = pc.binary_join_element_wise(
            pa.array(['<div id="d">'] * len(batch), pa.string()),
            batch["text"],
            pa.array(['</div>\x07&amp; &lt;tag&gt; &quot;q&quot; '
                      '&#39;s&#39;\u200b  \t x\n\n\n\n  end  ']
                     * len(batch), pa.string()),
            "")
        return pa.table({"doc_id": batch["doc_id"], "text": deco})

    out = ds.map_batches(decorate, batch_format="pyarrow") \
            .map_batches(SanitizeStage("text"), batch_format="pyarrow")

    def project(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": batch["doc_id"],
            "has_content": batch["has_content"],
            "clean_len": pc.cast(pc.utf8_length(batch["clean_text"]),
                                 pa.int64()),
        })

    return out.map_batches(project, batch_format="pyarrow")


# ----------------------------- multimodal ---------------------------- #

def multimodal_native(sf_dir: str):
    """NATIVE end-to-end multimodal pipeline — real payloads
    (PPM/WAV/PPMV, ``baram_ray.codecs``), real decode + real feature
    kernels through the actor pool; no stub in this path. Rows-only
    driver check; pixel/sample roundtrips and dimension identities
    asserted in tests/test_codecs_native.py."""
    import pandas as pd

    from baram_ray.multimodal import (DecodeStage, FeatureStage,
                                      synth_media_table)
    tbl = synth_media_table(120, seed=42, real_payloads=True)
    ds = ray.data.from_arrow(tbl)
    dec = ds.map_batches(DecodeStage,
                         fn_constructor_kwargs={"real_decode": True},
                         batch_format="pyarrow", batch_size=32,
                         concurrency=2).to_pandas()
    feats = ds.map_batches(FeatureStage,
                           fn_constructor_kwargs={"dim": 48,
                                                  "real_model": True},
                           batch_format="pyarrow", batch_size=32,
                           concurrency=2).to_pandas()
    import numpy as np
    feats["feat_l1"] = [round(float(np.abs(np.asarray(v)).sum()), 6)
                        for v in feats["feature"]]
    out = dec.merge(feats[["item_id", "feat_l1"]], on="item_id")
    return out[["item_id", "kind", "ok", "decoded_width",
                "decoded_height", "n_frames", "feat_l1"]] \
        .sort_values("item_id").reset_index(drop=True)


def multimodal_decode(sf_dir: str):
    """Binary-column plumbing: synth payload table → decode-stub actor
    pool → narrow feature rows (rows-only; schema is the check)."""
    from baram_ray.multimodal import DecodeStage, synth_media_table
    tbl = synth_media_table(200, seed=42)
    ds = ray.data.from_arrow(tbl)
    return ds.map_batches(DecodeStage, batch_format="pyarrow",
                          batch_size=64, concurrency=2)


def multimodal_frames(sf_dir: str):
    from baram_ray.multimodal import FrameSampleStage, synth_media_table
    tbl = synth_media_table(200, seed=42)
    ds = ray.data.from_arrow(tbl)
    return ds.map_batches(FrameSampleStage(), batch_format="pyarrow",
                          batch_size=64)


def multimodal_resize(sf_dir: str):
    """A1 image-prep chain: decode → resize-to-256 box (aspect
    preserved; dimensions real, pixel path honestly stubbed — no codecs
    in container). Rows-only driver check; dimension/aspect invariants
    pytest-asserted."""
    from baram_ray.multimodal import DecodeStage, ResizeStage, synth_media_table
    import ray.data as rd
    ds = rd.from_arrow(synth_media_table(256))
    decoded = ds.map_batches(DecodeStage, concurrency=2, batch_size=64,
                             batch_format="pyarrow")
    return decoded.map_batches(ResizeStage(256), batch_format="pyarrow")


def doc_sample_hash(sf_dir: str, rate: float = 0.1):
    """Deterministic 10% sample by Knuth multiplicative hash of doc_id
    (``baram_ray/sampling.py``): same row set on every run and shard
    layout. SQL-expressible (HUGEINT arithmetic) → hash-exact oracle."""
    from baram_ray.sampling import hash_sample
    ds = read_table(sf_dir, "documents", ["doc_id"])
    return hash_sample(ds, rate)


def doc_split_counts(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split by key hash →
    per-split row counts. SQL-expressible → hash-exact oracle."""
    from baram_ray.sampling import hash_split
    ds = read_table(sf_dir, "documents", ["doc_id"])
    out = hash_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1})
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("split", as_index=False).size() \
              .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    from ray.data.aggregate import Sum
    return (out.map_batches(partial, batch_format="pandas")
               .groupby("split").aggregate(Sum("n", alias_name="n")))


def doc_mix_weighted(sf_dir: str):
    """Deterministic training-mixture re-weighting: keep src0 at 100%,
    src1 at 50%, src2 at 25%; every other source drops. Pure function
    of (source, doc_id). SQL-expressible → hash-exact oracle."""
    from baram_ray.sampling import weighted_mix
    ds = read_table(sf_dir, "documents", ["doc_id", "source"])
    out = weighted_mix(ds, {"src0": 1.0, "src1": 0.5, "src2": 0.25})
    return ensure_cols(out, {"doc_id": "int64", "source": "object"})


def doc_decontam(sf_dir: str, n: int = 8):
    """Benchmark decontamination (``baram_ray/decontam.py``): flag every
    document containing any probe 8-gram. The probe set is derived
    deterministically from the corpus (tokens 4..11 of every 50th doc —
    standing in for an external eval suite, which is tiny by definition
    and therefore broadcast, never shuffled). Exact token-sequence
    semantics → hash-exact DuckDB unnest/semi-join oracle."""
    from baram_ray import decontam
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    # benchmark side: small driver-side read (the real-world shape is a
    # separate few-MB eval table; ray.put broadcasts it once)
    import pyarrow as pa

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["doc_id"].to_numpy() % 50 == 0))

    bench = (read_table(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(pick, batch_format="pyarrow")
             .to_pandas())
    # a corpus with no benchmark-eligible ids yields an empty frame
    # WITHOUT columns (Ray to_pandas quirk) — probe set is then empty
    texts = bench["text"].tolist() if "text" in bench.columns else []
    grams = decontam.benchmark_grams(texts, n=n, start=3, count=1)
    return ensure_cols(decontam.decontaminate(ds, grams, n=n),
                       {"doc_id": "int64"})


def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document: most-
    frequent-2-gram fraction + duplicate-3-gram fraction
    (``stages/text.py::RepetitionStage``). SQL-expressible → hash-exact
    oracle (exact IEEE divisions on both sides)."""
    from baram_ray.stages.text import RepetitionStage
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(RepetitionStage(), batch_format="pyarrow")


def doc_heavy_terms(sf_dir: str, topn: int = 20):
    """Misra–Gries heavy-hitter terms over the corpus token stream
    (``sketches.heavy_hitters``). With counter budget k=4096 ≫ the
    synthetic vocabulary no trim ever fires, so every count is EXACT
    and the DuckDB oracle (exact top-n term counts) is hash-exact; at
    web scale the identical operator degrades to the bounded-error
    sketch (est ≤ true ≤ est + err_bound; any term with frequency
    > n/(k+1) survives — pytest-asserted properties)."""
    import numpy as np
    import pyarrow as pa

    from baram_ray import sketches

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def keys(batch: pa.Table) -> np.ndarray:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend((t or "").lower().split())
        return np.asarray(toks, dtype=object)

    out = sketches.heavy_hitters(ds, keys, topn=topn)
    out = out.rename(columns={"key": "term"})
    out["est_count"] = out["est_count"].astype("int64")
    out["err_bound"] = out["err_bound"].astype("int64")
    return out


def doc_unigram_vocab(sf_dir: str, vocab_size: int = 45):
    """Distributed unigram-LM tokenizer TRAINING (Kudo 2018 /
    SentencePiece — ``unigram.py``): substring seeding + EM
    forward-backward + probability pruning, every pass a
    ``map_batches`` over the distinct-word table with the piece table
    broadcast. Rows-only driver check; distributed == single-process
    (vocab set exact, logp ≤1e-9, encodings exact) and reshard
    stability are pytest-enforced (tests/test_unigram.py)."""
    import pandas as pd

    from baram_ray.unigram import unigram_train
    ds = read_table(sf_dir, "documents", ["text"])
    logp = unigram_train(ds, vocab_size=vocab_size, seed_size=500)
    pieces = sorted(logp)
    return pd.DataFrame({
        "piece": pd.array(pieces, dtype=object),
        "logp": pd.array([round(logp[p], 6) for p in pieces],
                         dtype="float64"),
    })


def doc_unigram_token_count(sf_dir: str, vocab_size: int = 45):
    """Corpus-wide Viterbi encoding with the trained unigram vocab:
    per-doc piece counts (the unigram analogue of
    ``doc_bpe_token_count``). The vocab is deliberately SMALLER than
    needed to hold every corpus word, so real multi-piece
    segmentation happens. Rows-only driver check (segmentation isn't
    SQL-expressible); encode determinism is pytest-pinned."""
    import pyarrow as pa
    import ray as _ray

    from baram_ray.unigram import unigram_train, viterbi_encode
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    logp = unigram_train(ds, vocab_size=vocab_size, seed_size=500)
    ref = _ray.put(logp)

    def count(batch: pa.Table) -> pa.Table:
        lp = _ray.get(ref)
        memo: dict[str, int] = {}
        out = []
        for t in batch["text"].to_pylist():
            n = 0
            for w in (t or "").lower().split():
                k = memo.get(w)
                if k is None:
                    k = memo[w] = len(viterbi_encode(w, lp))
                n += k
            out.append(n)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_unigram_tokens": pa.array(
                             out, pa.int64())})

    return (ds.map_batches(count, batch_format="pyarrow")
              .to_pandas().sort_values("doc_id")
              .reset_index(drop=True))


def doc_distinct_hll(sf_dir: str):
    """Approximate distinct token count per language via mergeable
    HyperLogLog registers (``sketches.distinct_hll`` — 4 KiB of state
    per group rides the exchange instead of the distinct-token sets;
    the OpenSearch ``cardinality`` register sketch as a corpus
    operator). Rows-only driver check; the ≤5%-error vs exact and the
    reshard-stability contracts are pytest-enforced
    (tests/test_hll.py)."""
    import numpy as np
    import pyarrow as pa

    from baram_ray import sketches

    ds = read_table(sf_dir, "documents", ["lang", "text"])

    def flat(batch: pa.Table) -> pa.Table:
        langs, toks = [], []
        for lg, t in zip(batch["lang"].to_pylist(),
                         batch["text"].to_pylist()):
            ws = (t or "").lower().split()
            langs.extend([lg] * len(ws))
            toks.extend(ws)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "tok": pa.array(toks, pa.string())})

    flat_ds = ds.map_batches(flat, batch_format="pyarrow")
    out = sketches.distinct_hll(
        flat_ds,
        lambda b: b["tok"].to_numpy(zero_copy_only=False),
        "lang").to_pandas()
    out = out.sort_values("lang").reset_index(drop=True)
    out["est_distinct"] = out["est_distinct"].round(2).astype(
        "float64")
    return out


def doc_lm_score(sf_dir: str, alpha: float = 0.5):
    """CCNet-style corpus-LM quality scoring (Wenzek et al. 2020: docs
    are ranked by the perplexity of an n-gram LM; here the LM is a
    bigram model with add-``alpha`` smoothing trained ON the corpus
    itself in the same pass). Per doc: cross-entropy
    ``-1/n · Σ ln p(w2|w1)`` over its ``n`` bigram occurrences with
    ``p(w2|w1) = (c(w1 w2) + α) / (c(w1 ·) + α·V)``, and
    ``ppl = exp(ce)``. Low-ppl docs look like the corpus average
    (keep); high-ppl docs are outliers/noise (filter).

    Scale shape: (doc_id, w1, w2, cnt) bigram rows are exploded per
    batch and hit ONE bucketed exchange keyed on the CONTEXT word w1 —
    a bucket holds every occurrence of its contexts, so both the
    bigram count c12 and the context count c1 are in-bucket group sums
    (no vocabulary broadcast, nothing corpus-sized on the driver); the
    per-doc reduction is the second exchange. V (distinct unigrams) is
    the row COUNT of a per-term partial-dedup exchange — a scalar.
    ce/ppl rounded to 6 (absorbs sum-order + libm ulps vs the oracle,
    same treatment as doc_cooccur_pmi)."""
    from collections import Counter

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from baram_ray.util import grouped_agg, grouped_map

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def bigram_rows(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        w1s: list[str] = []
        w2s: list[str] = []
        cnts: list[int] = []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            toks = (t or "").lower().split()
            for (a, b), n in Counter(zip(toks, toks[1:])).items():
                ids.append(did)
                w1s.append(a)
                w2s.append(b)
                cnts.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "cnt": pa.array(cnts, pa.int64())})

    def term_rows(batch: pa.Table) -> pa.Table:
        terms: set[str] = set()
        for t in batch["text"].to_pylist():
            terms.update((t or "").lower().split())
        return pa.table({"term": pa.array(sorted(terms), pa.string())})

    # V: distinct unigrams — per-batch set, exchange-deduped, counted
    vocab = grouped_agg(ds.map_batches(term_rows, batch_format="pyarrow"),
                        ["term"], {"n": ("term", "size")}, num_buckets=32)
    v_size = int(vocab.count())

    bg = ds.map_batches(bigram_rows, batch_format="pyarrow")

    def attach_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.copy()
        g12 = bucket.groupby(["w1", "w2"], sort=False)["cnt"]
        bucket["c12"] = g12.transform("sum").astype("int64")
        g1 = bucket.groupby("w1", sort=False)["cnt"]
        bucket["c1"] = g1.transform("sum").astype("int64")
        return bucket

    joined = grouped_map(bg, ["w1"], attach_counts, num_buckets=32)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        lp = np.log((bucket["c12"].to_numpy(np.float64) + alpha)
                    / (bucket["c1"].to_numpy(np.float64) + alpha * v_size))
        b = bucket.assign(_wlp=lp * bucket["cnt"].to_numpy(np.float64))
        g = b.groupby("doc_id", sort=False).agg(
            n_bigrams=("cnt", "sum"), _s=("_wlp", "sum")).reset_index()
        ce = -g["_s"] / g["n_bigrams"]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_bigrams": g["n_bigrams"].astype("int64"),
            "cross_entropy": ce.round(6),
            "ppl": np.exp(ce).round(6),
        })

    return grouped_map(joined, ["doc_id"], per_doc, num_buckets=32)


def doc_shuffle_head(sf_dir: str, seed: int = 7, k: int = 20):
    """Deterministic seeded training-order shuffle
    (``sampling.hash_shuffle``): first ``k`` rows of the shuffled order.
    The head SET is order-determined, so the hash-exact SQL oracle
    (ORDER BY the same hash LIMIT k) verifies the global order, not
    just membership."""
    from baram_ray.sampling import hash_shuffle
    ds = read_table(sf_dir, "documents", ["doc_id"])
    return hash_shuffle(ds, seed=seed).limit(k)


def doc_pack_bins(sf_dir: str, max_tokens: int = 128):
    """Greedy first-fit sequence packing of whitespace token counts
    into ``max_tokens`` context bins (per-block, zero-shuffle).
    Rows-only driver check; the packing invariants (every doc exactly
    once, no bin over budget unless single-doc, ≥50% fill) are
    pytest-checked."""
    from baram_ray.pipelines.documents import token_count_ws
    from baram_ray.sampling import pack_sequences
    return pack_sequences(token_count_ws(sf_dir), max_tokens)


def text_pii(sf_dir: str):
    """PII scrub (``stages/text.py::PiiStage``): per-doc email/IPv4/phone
    counts + sha256 of the redacted text. The synthetic corpus carries no
    PII, so the callable first augments each doc with deterministic
    doc_id-derived contact strings (the SQL oracle concatenates the SAME
    strings) — the stage itself is generic and runs unmodified over any
    table. Hash-exact oracle: identical RE2-safe patterns, identical
    nesting order, sha256 equality of the redacted text end-to-end."""
    import pyarrow as pa

    from baram_ray.stages.text import PiiStage

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = [
            f"{t or ''} contact user{d}@mail{d % 7}.com srv "
            f"10.{d % 256}.{(d * 7) % 256}.{(d * 13) % 256} "
            f"tel 010-{1000 + d % 9000}-{2000 + d % 8000}"
            for d, t in zip(ids, batch["text"].to_pylist())
        ]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return (ds.map_batches(augment, batch_format="pyarrow")
              .map_batches(PiiStage(), batch_format="pyarrow"))


def doc_dup_spans(sf_dir: str, k: int = 5, hash_spans: bool = False):
    """Exact duplicate-span exposure per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    per-doc signal of substring-level duplication): for every doc, the
    number of its distinct ``k``-token spans that also appear in at
    least one other document, plus the duplicated fraction.

    Scale shape: distinct (span, doc_id) rows stream through ONE
    bucketed exchange on the span (each span's doc-frequency is
    computed wholly inside its bucket and immediately collapsed to
    per-doc partial counts — the corpus-sized span table never
    aggregates globally), then a doc-cardinality exchange sums the
    partials. ``hash_spans=True`` is the production path — the span
    key is an 8-byte blake2b instead of the k-word string (~10x less
    exchange traffic; collisions ~n^2/2^64, i.e. none at real scale —
    pytest asserts corpus-equality of the two paths); the string key
    keeps the DuckDB oracle exact."""
    import pandas as pd
    import pyarrow as pa

    from baram_ray.util import grouped_agg, grouped_map

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def span_rows(batch: pa.Table) -> pa.Table:
        import hashlib
        ids_out: list[int] = []
        grams: list = []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            toks = (t or "").lower().split()
            if len(toks) < k:
                continue
            for g in {" ".join(toks[i:i + k])
                      for i in range(len(toks) - k + 1)}:
                ids_out.append(d)
                grams.append(
                    int.from_bytes(hashlib.blake2b(
                        g.encode(), digest_size=8).digest(), "big") >> 1
                    if hash_spans else g)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "gram": pa.array(
                             grams,
                             pa.int64() if hash_spans else pa.string())})

    spans = ds.map_batches(span_rows, batch_format="pyarrow")

    def bucket_count(bucket: pd.DataFrame) -> pd.DataFrame:
        df_per_gram = bucket.groupby("gram", sort=False)["doc_id"] \
                            .transform("size")
        dup = (df_per_gram > 1).astype("int64")
        out = bucket.assign(dup=dup).groupby("doc_id", as_index=False) \
                    .agg(n_dup_partial=("dup", "sum"),
                         n_grams_partial=("dup", "size"))
        return out

    partials = grouped_map(spans, ["gram"], bucket_count, num_buckets=32)
    totals = grouped_agg(partials, ["doc_id"],
                         {"n_dup_grams": ("n_dup_partial", "sum"),
                          "n_grams": ("n_grams_partial", "sum")},
                         num_buckets=8)

    def frac(batch: pa.Table) -> pa.Table:
        import numpy as np
        nd = batch["n_dup_grams"].to_numpy().astype("float64")
        ng = batch["n_grams"].to_numpy().astype("float64")
        return batch.append_column(
            "dup_frac", pa.array(np.round(nd / ng, 6), pa.float64()))

    return totals.map_batches(frac, batch_format="pyarrow")


def doc_dup_spans_removed(sf_dir: str, k: int = 5):
    """ExactSubstr-style duplicate-span REMOVAL (Lee et al. 2022 §4.1 —
    the companion to ``doc_dup_spans``' exposure signal): every
    ``k``-token span occurring ≥ 2 times anywhere in the corpus
    (across OR within docs) is cut from every document; a token
    survives iff no duplicated span covers it. Returns (doc_id,
    n_tokens, n_removed, clean_text) — clean_text is the surviving
    tokens re-joined.

    Scale shape: ALL span occurrences (doc_id, pos, span) stream
    through ONE bucketed exchange keyed on the span — the occurrence
    count is the in-bucket group size, and only the (doc_id, pos) rows
    of duplicated spans leave the bucket; the rebuild is a cogroup of
    the docs table with those positions (interval-union via a
    difference array per doc). Nothing corpus-sized on the driver.
    Hash-exact DuckDB oracle (string-span keys; the hashed-key
    production variant of ``doc_dup_spans`` applies here identically).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from baram_ray.util import cogroup, grouped_map

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def span_pos_rows(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        poss: list[int] = []
        spans: list[str] = []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            toks = (t or "").split()
            for i in range(len(toks) - k + 1):
                ids.append(d)
                poss.append(i)
                spans.append(" ".join(toks[i:i + k]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "span": pa.array(spans, pa.string())})

    spans = docs.map_batches(span_pos_rows, batch_format="pyarrow")

    def dup_positions(bucket: pd.DataFrame) -> pd.DataFrame:
        occ = bucket.groupby("span", sort=False)["doc_id"].transform("size")
        return bucket.loc[occ >= 2, ["doc_id", "pos"]]

    dups = grouped_map(spans, ["span"], dup_positions, num_buckets=32)

    def rebuild(docs_df: pd.DataFrame, dup_df: pd.DataFrame) -> pd.DataFrame:
        by_doc = {d: g["pos"].to_numpy(np.int64)
                  for d, g in dup_df.groupby("doc_id", sort=False)}
        ids, ntok, nrem, clean = [], [], [], []
        for d, t in zip(docs_df["doc_id"].to_numpy(),
                        docs_df["text"].to_list()):
            toks = (t or "").split()
            n = len(toks)
            diff = np.zeros(n + 1, dtype=np.int64)
            for p in by_doc.get(d, ()):
                diff[p] += 1
                diff[min(p + k, n)] -= 1
            covered = np.cumsum(diff[:n]) > 0
            kept = [tok for tok, c in zip(toks, covered) if not c]
            ids.append(int(d))
            ntok.append(n)
            nrem.append(int(covered.sum()))
            clean.append(" ".join(kept))
        return pd.DataFrame({
            "doc_id": np.asarray(ids, np.int64),
            "n_tokens": np.asarray(ntok, np.int64),
            "n_removed": np.asarray(nrem, np.int64),
            "clean_text": pd.Series(clean, dtype="object"),
        })

    return cogroup(docs, dups, ["doc_id"], rebuild, num_buckets=16)


def doc_tfidf_top(sf_dir: str):
    from baram_ray.pipelines.documents import tfidf_top
    return tfidf_top(sf_dir)


def sim_kmeans(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed Lloyd k-means assignment over the embeddings table
    (``similarity.kmeans_fit`` — per-batch partial sums, zero shuffle,
    O(k·d) driver state per iteration). Rows-only driver check; pytest
    asserts exact agreement with a single-process numpy Lloyd reference
    and determinism across runs."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.kmeans_assign(ds, k=k, iters=iters)


def doc_sample_stratified(sf_dir: str):
    """Stratified deterministic sampling per language (the corpus-
    rebalancing op a multilingual pretraining mix needs): en kept at
    50%, every other lang at 10%, decided by the same Knuth key hash
    as ``doc_sample_hash`` (nesting + reshard-stability hold per
    stratum). Returns per-lang kept counts; hash-exact HUGEINT SQL
    oracle."""
    from baram_ray.sampling import hash_sample_stratified
    from baram_ray.util import grouped_agg

    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    kept = hash_sample_stratified(ds, {"en": 0.5}, 0.1,
                                  stratum_col="lang")
    out = grouped_agg(kept, ["lang"], {"n_kept": (None, "count")},
                      num_buckets=2).to_pandas()
    out["n_kept"] = out["n_kept"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def dedup_fingerprint(sf_dir: str, min_shared: int = 50):
    """MOSS-style winnowing-fingerprint near-dup candidates
    (``dedup.fingerprint_candidates``): docs sharing ≥ ``min_shared``
    selected fingerprints. The synthetic corpus draws from a ~40-word
    vocabulary, so low thresholds match almost everything (median
    pair shares 15 fingerprints); 50 keeps only heavy substring
    overlap. Rows-only driver check; the winnowing guarantee (shared
    substring ≥ window+k−1 chars ⇒ shared fingerprint) and candidate
    recall on planted overlaps are pytest-asserted."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.fingerprint_candidates(ds, "text",
                                       min_shared=min_shared)
    return ensure_cols(out, {"a": "int64", "b": "int64",
                             "n_shared": "int64"})


def sim_range_search(sf_dir: str, threshold: float = 0.3):
    """Cosine range search: all vectors within cosine ≥ 0.3 of the
    fixed query vectors (``similarity.range_search``) — the radius
    counterpart of top-k kNN. Hash-exact SQL oracle (f64 arithmetic on
    both sides, round-6)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = similarity.range_search(ds, KNN_QUERY_IDS, threshold)
    return ensure_cols(out, {"query_id": "int64", "vec_id": "int64",
                             "cosine": "float64"})


def doc_quality_model(sf_dir: str):
    """Distributed trainable classifier (``baram_ray.linear``): fit a
    logistic model for the long-document label (n_chars > 300) with
    distributed IRLS/Newton — one streaming partial pass per step
    (gradient + (d+1)-square Gram partials, O(d²) driver state), ~8
    passes to convergence — then score every doc in one stateless
    pass.
    Returns (doc_id, prob, pred). Iterative training is not
    SQL-expressible (rows-only driver check); pytest asserts the
    distributed fit matches the in-memory numpy reference to ~1e-9,
    reshard stability, and ≥0.9 train accuracy on the separable label.
    """
    from baram_ray.linear import logistic_fit, logistic_score

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    w = logistic_fit(
        ds, label_fn=lambda b: (b["n_chars"].to_numpy() > 300)
        .astype("float64"), iters=8, method="irls")
    return logistic_score(
        read_table(sf_dir, "documents", ["doc_id", "text"]), w)


def sim_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) over the embeddings table: k-means
    clusters (distributed Lloyd) then per-cluster greedy leader pruning
    at cosine ≥ 0.9 through the cluster-keyed exchange. Rows-only
    driver check; pytest asserts the invariants (no kept pair ≥ t
    within a cluster, every dropped row has a kept leader ≥ t) and
    determinism."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.semdedup(ds, threshold=0.9, k=8, iters=5)


def doc_dsir_sample(sf_dir: str, k: int = 100):
    """DSIR importance resampling (``baram_ray.dsir``, Xie et al.
    2023): hashed-bigram histograms for raw (all documents) and target
    (the lexicographically-first source's documents), per-doc log
    importance weights, deterministic Gumbel top-k selection. Rows-only
    driver check; pytest asserts target-enrichment on the separable
    code corpus plus reshard-stable determinism."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from baram_ray.dsir import dsir_sample

    raw = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    first_source = sorted(
        read_table(sf_dir, "documents", ["source"])
        .unique("source"))[0]

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["source"], first_source))

    target = raw.map_batches(pick, batch_format="pyarrow")
    return dsir_sample(raw, target, k=k)


def doc_mix_adaptive(sf_dir: str, boost: float = 0.5):
    """ADAPTIVE training-mixture reweighting: per-source sampling rates
    derived from the corpus itself (share of total characters), then
    the deterministic Knuth-hash keep — the data-derived counterpart
    of ``doc_mix_weighted``'s fixed weights (DoReMi-style domain
    reweighting reduced to exact arithmetic). rate_s = min(1,
    (chars_s / total) · n_sources · boost); the keep test compares the
    32-bit key hash against floor(rate · 2^32) as INTEGERS, and every
    float on the way derives from exact integer sums with the same
    operation order as the SQL — hash-exact end to end. One tiny
    per-source aggregate + one streaming filter pass."""
    import numpy as np
    import pandas as pd

    import ray as _ray

    from baram_ray.pipelines.util import broadcast, ensure_cols
    from baram_ray.sampling import knuth_hash32
    from baram_ray.util import grouped_agg

    def chars_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            chars=("n_chars", "sum"))
        g["chars"] = g["chars"].astype("int64")
        return g

    stats = grouped_agg(
        read_table(sf_dir, "documents", ["source", "n_chars"])
        .map_batches(chars_partial, batch_format="pandas"),
        ["source"], {"chars": ("chars", "sum")},
        num_buckets=2).to_pandas()          # ≤ |sources| rows
    total = int(stats["chars"].sum())
    k = len(stats)
    cuts = {}
    for r in stats.itertuples():
        rate = min(1.0, (int(r.chars) / total) * k * boost) \
            if total else 0.0
        cuts[str(r.source)] = int(np.floor(rate * 4294967296.0))
    cref = broadcast(cuts)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cm = _ray.get(cref)
        cut = df["source"].map(cm).fillna(0).to_numpy(np.int64)
        h = knuth_hash32(df["doc_id"].to_numpy(np.int64)).astype(np.int64)
        m = h < cut
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[m],
                             "source": df["source"].to_numpy()[m]})

    out = read_table(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(keep, batch_format="pandas")
    return ensure_cols(out, {"doc_id": "int64", "source": "object"})


def dedup_jaccard_clusters(sf_dir: str):
    """Connected components over the EXACT n-gram-Jaccard duplicate
    graph: the (already SQL-oracled) PPJoin pair set feeds the
    distributed min-label propagation (``cluster_from_pairs_ds``),
    labelling every document with its component's minimum doc_id
    (singletons label themselves). Because the pair set is exact, the
    component labels are fully SQL-checkable via a RECURSIVE-CTE
    reachability closure — a hash-exact oracle for an iterative graph
    algorithm."""
    from baram_ray.pipelines.util import ensure_cols

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(ds, "text", n=JACCARD_N,
                                      threshold=JACCARD_T) \
        .map_batches(lambda b: b.select(["a", "b"]),
                     batch_format="pyarrow")
    ids = read_table(sf_dir, "documents", ["doc_id"])
    out = dedup.cluster_from_pairs_ds(pairs, ids)
    return ensure_cols(out, {"doc_id": "int64", "cluster": "int64"})


def doc_bpe_token_count(sf_dir: str, n_merges: int = 48):
    """APPLY the trained BPE tokenizer corpus-wide: train merges (the
    same actor-sharded loop as ``doc_bpe_merges``), then count BPE
    tokens per document through an actor-pool encode stage (ranks
    table built once per actor, per-word memo — Zipfian reuse makes
    the cache hit rate approach 1). Rows-only driver check; encode
    semantics verified against the pure ``bpe_encode`` in tests."""
    from baram_ray.bpe import BpeEncodeStage, bpe_train
    from baram_ray.pipelines.util import ensure_cols

    ds = read_table(sf_dir, "documents", ["text"])
    merges_df = bpe_train(ds, n_merges=n_merges, min_freq=2,
                          num_shards=4)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(BpeEncodeStage, fn_constructor_args=(merges,),
                           batch_format="pandas", concurrency=2)
    return ensure_cols(out, {"doc_id": "int64", "n_bpe_tokens": "int64"})
