"""Object-store spill stress (round-4 verdict item 5): run the flagship
index build AND the minhash near-dup chain with ``object_store_memory``
capped far below the data volume, forcing Ray's plasma spill path, and
assert bit-identical results vs an uncapped run.

Why: at 100 TB the object store is ALWAYS under pressure — spilling is
the steady state, not an edge case — yet every other scale proof here
fits comfortably in the 128 GiB store. This is the one subsystem a
comfortable bench never exercises.

Usage:
    python tools/spill_stress.py                     # orchestrate both runs
    python tools/spill_stress.py --rows 300000 --cap 400000000
    python tools/spill_stress.py --one <rows> <cap> <out_json>   # child

The orchestrator runs the same job twice in FRESH processes (capped /
uncapped own their Ray session; object_store_memory is fixed at init)
and prints one JSON line with both walls, the spilled byte count of the
capped run, and the identity verdict.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

CORPUS_ROOT = "/tmp/spill_corpus"


def make_corpus(rows: int) -> str:
    """Deterministic word-soup corpus with planted near-dup structure
    (every 10th doc is a lightly-mutated copy of its predecessor), split
    into 8 parquet parts. Cached per row count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"{CORPUS_ROOT}_{rows}"
    if os.path.isdir(d) and len(glob.glob(f"{d}/*.parquet")) == 8:
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    per = rows // 8
    for p in range(8):
        ids, texts = [], []
        prev = None
        for i in range(per):
            doc_id = p * per + i
            if i % 10 == 9 and prev is not None:
                words = prev.copy()
                words[rng.integers(0, len(words))] = vocab[
                    rng.integers(0, len(vocab))]
            else:
                words = vocab[rng.integers(0, len(vocab), 60)]
            prev = words
            ids.append(doc_id)
            texts.append(" ".join(words))
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), f"{d}/part{p}.parquet")
    return d


def _session_dir() -> str:
    import ray
    try:
        return ray._private.worker._global_node.get_session_dir_path()
    except Exception:
        cands = sorted(glob.glob("/tmp/ray/session_*"),
                       key=os.path.getmtime)
        return cands[-1] if cands else ""


def _spilled_bytes() -> int:
    """Peak spill evidence: the raylet's cumulative "Spilled N MiB" log
    high-water mark (spill files are deleted as refs free, so a
    directory scan at completion undercounts), plus whatever still sits
    in the spill directory."""
    import re
    sess = _session_dir()
    peak_mib = 0
    for log in glob.glob(os.path.join(sess, "logs", "raylet*.out")):
        try:
            with open(log, errors="replace") as f:
                for line in f:
                    m = re.search(r"Spilled (\d+) MiB", line)
                    if m:
                        peak_mib = max(peak_mib, int(m.group(1)))
        except OSError:
            pass
    on_disk = 0
    for root, _, files in os.walk(os.path.join(sess,
                                               "ray_spilled_objects")):
        for f in files:
            try:
                on_disk += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return max(peak_mib * 1024 * 1024, on_disk)


def run_one(rows: int, cap: int, out_json: str) -> None:
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    import ray
    kw = {"object_store_memory": cap} if cap else {}
    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "16")), include_dashboard=False,
        logging_level="ERROR", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    corpus = make_corpus(rows)
    tag = "cap" if cap else "uncapped"

    # --- flagship build ---------------------------------------------------
    from baram_ray.index.build import IndexConfig, build_index
    idx = f"/tmp/spill_idx_{rows}_{tag}"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=("doc_id",), keep=())
    t0 = time.perf_counter()
    res = build_index(glob.glob(f"{corpus}/*.parquet"), idx, cfg,
                      resume=False)
    wall_build = time.perf_counter() - t0
    td = pq.read_table(os.path.join(idx, "termdict")) \
        .sort_by([("field", "ascending"), ("term", "ascending")])
    sig_build = hashlib.sha256(
        json.dumps({"n_docs": res.n_docs,
                    "df": td.to_pydict()}, sort_keys=True).encode()
    ).hexdigest()

    # --- minhash near-dup chain --------------------------------------------
    import ray.data as rd

    from baram_ray import dedup
    ds = rd.read_parquet(corpus)
    t0 = time.perf_counter()
    pairs = dedup.minhash_dedup(ds, "text", threshold=0.7)
    ids = rd.read_parquet(corpus, columns=["doc_id"])
    clusters = dedup.cluster_from_pairs_ds(pairs, ids).to_pandas()
    wall_dedup = time.perf_counter() - t0
    clusters = clusters.sort_values(list(clusters.columns),
                                    kind="stable").reset_index(drop=True)
    sig_dedup = hashlib.sha256(
        clusters.to_csv(index=False).encode()).hexdigest()

    out = {"rows": rows, "cap": cap, "wall_build": round(wall_build, 2),
           "wall_dedup": round(wall_dedup, 2), "n_docs": res.n_docs,
           "sig_build": sig_build,
           "n_cluster_rows": int(len(clusters)),
           "n_clusters": int(clusters["cluster"].nunique())
           if "cluster" in clusters else None,
           "sig_dedup": sig_dedup,
           "spilled_bytes": _spilled_bytes()}
    with open(out_json, "w") as f:
        json.dump(out, f)
    shutil.rmtree(idx, ignore_errors=True)
    ray.shutdown()


def orchestrate(rows: int, cap: int) -> dict:
    outs = {}
    for tag, c in (("uncapped", 0), ("capped", cap)):
        oj = f"/tmp/spill_{tag}_{rows}.json"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ,
               "PYTHONPATH": repo + os.pathsep
               + os.environ.get("PYTHONPATH", "")}
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             str(rows), str(c), oj],
            cwd=repo, env=env, timeout=3600)
        if r.returncode != 0:
            raise SystemExit(f"{tag} run failed rc={r.returncode}")
        with open(oj) as f:
            outs[tag] = json.load(f)
    identical = (outs["uncapped"]["sig_build"] == outs["capped"]["sig_build"]
                 and outs["uncapped"]["sig_dedup"]
                 == outs["capped"]["sig_dedup"])
    summary = {"rows": rows, "cap": cap, "identical": identical,
               "uncapped": outs["uncapped"], "capped": outs["capped"]}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        rows = cap = None
        args = sys.argv[1:]
        rows = int(args[args.index("--rows") + 1]) if "--rows" in args \
            else 300_000
        cap = int(args[args.index("--cap") + 1]) if "--cap" in args \
            else 400_000_000
        orchestrate(rows, cap)
