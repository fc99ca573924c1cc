"""Multi-node dress rehearsal on one host (round-4 verdict item 8).

Every other scale proof here runs one raylet + one plasma store, so
object "transfers" are all local-memory. This harness starts a REAL
Ray cluster topology on the single host — `ray start --head` plus 3
worker raylets, each with its own object store and 8 CPUs — and runs
the flagship index build and the actor-pool BM25 query path against
it. Map outputs land in 4 separate plasma stores, so every exchange
reduce and every cross-node consumer exercises the ObjectManager
pull/push path the single-process bench never touches. Results are
compared bit-exactly against a fresh single-process run of the same
jobs at the same total CPU count.

Usage:
    python tools/multinode.py                  # orchestrate both legs
    python tools/multinode.py --rows 120000
    python tools/multinode.py --drive <rows> <out_json>   # child leg
      (env MULTINODE_ADDR=<head addr> → join cluster; unset → local)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEAD_PORT = 6391           # off the 6379 default: no clash with leftovers
PER_NODE_CPUS = 8
N_WORKERS = 3              # + head = 4 nodes, 32 CPUs total
STORE = 2_000_000_000      # 2 GB per-node plasma (4 stores on one host)


def drive(rows: int, out_json: str) -> None:
    """One leg: run build + actor-pool queries, write signatures.
    Joins MULTINODE_ADDR when set (cluster leg), else owns a local
    single-process session at the same total CPU count."""
    import glob
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    import ray

    addr = os.environ.get("MULTINODE_ADDR", "")
    if addr:
        ray.init(address=addr, logging_level="ERROR")
        # wait for every raylet to register before scheduling
        deadline = time.time() + 60
        while time.time() < deadline:
            alive = [n for n in ray.nodes() if n["Alive"]]
            if len(alive) >= N_WORKERS + 1:
                break
            time.sleep(0.5)
        alive = [n for n in ray.nodes() if n["Alive"]]
        assert len(alive) >= N_WORKERS + 1, \
            f"cluster incomplete: {len(alive)} nodes"
    else:
        ray.init(address="local",
                 num_cpus=PER_NODE_CPUS * (N_WORKERS + 1),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spill_stress import make_corpus
    corpus = make_corpus(rows)
    tag = "cluster" if addr else "single"

    # node-spread probe ON THE DATA PATH: which raylets ran read tasks
    import ray.data as rd

    def _node_tag(b):
        import ray as _r
        return {"node": [_r.get_runtime_context().get_node_id()]}

    nodes_seen = {r["node"] for r in rd.read_parquet(corpus)
                  .map_batches(_node_tag, batch_format="pyarrow")
                  .take_all()}

    # --- flagship build (combiner → range exchange → encode) ----------
    from baram_ray.index.build import IndexConfig, build_index
    idx = f"/tmp/multinode_idx_{rows}_{tag}"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(fields=("text",), id_cols=("doc_id",), keep=())
    t0 = time.perf_counter()
    res = build_index(glob.glob(f"{corpus}/*.parquet"), idx, cfg,
                      resume=False)
    wall_build = time.perf_counter() - t0
    td = pq.read_table(os.path.join(idx, "termdict")) \
        .sort_by([("field", "ascending"), ("term", "ascending")])
    sig_build = hashlib.sha256(
        json.dumps({"n_docs": res.n_docs, "df": td.to_pydict()},
                   sort_keys=True).encode()).hexdigest()

    # --- scatter-gather query path (actor pool spread over nodes) -----
    from baram_ray.query.engine import QueryActor
    queries = [{"query_id": i, "text": f"w{i * 37 % 5000:04d} "
                                       f"w{i * 101 % 5000:04d}",
                "k": 10} for i in range(64)]
    t0 = time.perf_counter()
    hits = (rd.from_items(queries)
            .map_batches(QueryActor, fn_constructor_args=(idx,),
                         batch_format="pandas",
                         concurrency=N_WORKERS + 1)
            .to_pandas())
    wall_query = time.perf_counter() - t0
    hits = hits.sort_values(list(hits.columns),
                            kind="stable").reset_index(drop=True)
    hits["score"] = hits["score"].round(6)
    sig_query = hashlib.sha256(
        hits.to_csv(index=False).encode()).hexdigest()

    out = {"leg": tag, "rows": rows,
           "n_nodes": len([n for n in ray.nodes() if n["Alive"]])
           if addr else 1,
           "data_nodes_seen": len(nodes_seen),
           "wall_build": round(wall_build, 2),
           "wall_query": round(wall_query, 2),
           "n_docs": res.n_docs, "n_hits": int(len(hits)),
           "sig_build": sig_build, "sig_query": sig_query}
    with open(out_json, "w") as f:
        json.dump(out, f)
    shutil.rmtree(idx, ignore_errors=True)
    ray.shutdown()


def _sh(args: list[str], env: dict) -> None:
    r = subprocess.run(args, env=env, capture_output=True, text=True,
                       timeout=120)
    if r.returncode != 0:
        raise SystemExit(f"{' '.join(args)} rc={r.returncode}\n"
                         f"{r.stdout}\n{r.stderr}")


def orchestrate(rows: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    base["PYTHONPATH"] = repo + os.pathsep + base.get("PYTHONPATH", "")
    outs = {}

    # leg 1: single-process local session, 32 CPUs
    oj = f"/tmp/multinode_single_{rows}.json"
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--drive", str(rows), oj],
                       cwd=repo, env=base, timeout=1800)
    if r.returncode != 0:
        raise SystemExit(f"single leg failed rc={r.returncode}")
    with open(oj) as f:
        outs["single"] = json.load(f)

    # leg 2: 4-raylet cluster (head + 3 workers), 8 CPUs / 2 GB each
    subprocess.run(["ray", "stop", "--force"], env=base,
                   capture_output=True, timeout=120)
    addr = f"127.0.0.1:{HEAD_PORT}"
    try:
        _sh(["ray", "start", "--head", f"--port={HEAD_PORT}",
             f"--num-cpus={PER_NODE_CPUS}",
             f"--object-store-memory={STORE}",
             "--disable-usage-stats"], base)
        for _ in range(N_WORKERS):
            _sh(["ray", "start", f"--address={addr}",
                 f"--num-cpus={PER_NODE_CPUS}",
                 f"--object-store-memory={STORE}"], base)
        oj = f"/tmp/multinode_cluster_{rows}.json"
        env = {**base, "MULTINODE_ADDR": addr}
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--drive", str(rows), oj],
                           cwd=repo, env=env, timeout=1800)
        if r.returncode != 0:
            raise SystemExit(f"cluster leg failed rc={r.returncode}")
        with open(oj) as f:
            outs["cluster"] = json.load(f)
    finally:
        subprocess.run(["ray", "stop", "--force"], env=base,
                       capture_output=True, timeout=120)

    identical = (outs["single"]["sig_build"]
                 == outs["cluster"]["sig_build"]
                 and outs["single"]["sig_query"]
                 == outs["cluster"]["sig_query"])
    summary = {"rows": rows, "identical": identical,
               "single": outs["single"], "cluster": outs["cluster"]}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--drive":
        drive(int(sys.argv[2]), sys.argv[3])
    else:
        rows = int(sys.argv[sys.argv.index("--rows") + 1]) \
            if "--rows" in sys.argv else 120_000
        # nonzero exit on signature divergence so `multinode.py && ...`
        # treats the rehearsal as a real check, not a report
        sys.exit(0 if orchestrate(rows)["identical"] else 1)
