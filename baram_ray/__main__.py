"""CLI — the user-facing command surface (reference: 11 clap subcommands,
``src/main.rs:38-287``; ours covers the batch-engine subset).

One of the few places allowed to own a Ray session (with bench.py and the
test fixture); the library itself never calls ``ray.init``.

    python -m baram_ray build  --input corpus.parquet --out /tmp/idx \
                               [--fields content,path] [--no-resume]
    python -m baram_ray search --index /tmp/idx --query "hash join" [-k 10]
    python -m baram_ray stats  --index /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ray_up(args.num_cpus)
    from baram_ray.index.build import (
        IndexConfig, build_index, build_index_incremental,
    )
    if args.config:
        from baram_ray.config import load_config
        cfg = load_config(args.config).index_config()
    else:
        cfg = IndexConfig(
            fields=tuple(args.fields.split(",")),
            id_cols=tuple(f for f in args.id_cols.split(",") if f),
            keep=tuple(f for f in args.keep.split(",") if f),
            on_duplicate=args.on_duplicate)
    if args.incremental:
        if args.since is not None:
            raise SystemExit(
                "--since is for full builds; --incremental already skips "
                "unchanged files by fingerprint without reading them")
        res = build_index_incremental(args.input, args.out, cfg,
                                      resume=not args.no_resume)
    else:
        res = build_index(args.input, args.out, cfg,
                          resume=not args.no_resume, since=args.since)
    print(json.dumps({
        "out_dir": res.out_dir, "n_docs": res.n_docs, "n_terms": res.n_terms,
        "num_shards": res.num_shards, "stage_seconds": res.stage_seconds,
        "resumed_stages": res.resumed_stages,
    }))
    from baram_ray.i18n import t
    print(t("cli.build.completed", count=res.n_docs,
            seconds=round(sum(res.stage_seconds.values()), 1)),
          file=sys.stderr)
    return 0


def cmd_search(args) -> int:
    _ray_up(args.num_cpus)
    from baram_ray.query.engine import QueryEngine
    from baram_ray.state.aliases import resolve
    eng = QueryEngine(resolve(args.index))
    filters: dict = dict(kv.split("=", 1) for kv in (args.filter or []))
    for kv in args.range or []:           # COL=LO:HI numeric range filter
        col, spec = kv.split("=", 1)
        lo, _, hi = spec.partition(":")
        rng = {}
        if lo:
            rng["gte"] = float(lo) if "." in lo else int(lo)
        if hi:
            rng["lte"] = float(hi) if "." in hi else int(hi)
        filters[col] = rng
    after = None
    if args.after:
        s, _, d = args.after.partition(":")
        after = (float(s), int(d))
    hits = eng.search(args.query, k=args.k, filters=filters or None,
                      algorithm=args.algorithm, min_score=args.min_score,
                      after=after)
    for rank, (doc_id, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": int(doc_id),
                          "score": round(float(score), 6)}))
    from baram_ray.i18n import t
    print(t("cli.search.results", count=len(hits), query=args.query),
          file=sys.stderr)
    return 0


def cmd_compact(args) -> int:
    from baram_ray.index.compact import compact_segments
    print(json.dumps(compact_segments(args.index, target_mb=args.target_mb)))
    return 0


def cmd_delete(args) -> int:
    from baram_ray.index.deletes import delete_by_query
    n = delete_by_query(args.index, args.field, args.value)
    print(json.dumps({"deleted": n}))
    return 0


def cmd_purge(args) -> int:
    _ray_up(args.num_cpus)
    from baram_ray.index.deletes import purge_deletes
    print(json.dumps(purge_deletes(args.index)))
    return 0


def cmd_snapshot(args) -> int:
    from baram_ray.state.snapshot import snapshot_index
    man = snapshot_index(args.index, args.dest, base=args.base)
    print(json.dumps({"files": man["n_files"],
                      "reused": man["n_reused"],
                      "bytes": man["total_bytes"]}))
    return 0


def cmd_restore(args) -> int:
    from baram_ray.state.snapshot import restore_index
    man = restore_index(args.snapshot, args.target)
    print(json.dumps({"files": man["n_files"],
                      "bytes": man["total_bytes"]}))
    return 0


def cmd_verify_snapshot(args) -> int:
    from baram_ray.state.snapshot import verify_snapshot
    man = verify_snapshot(args.snapshot)
    print(json.dumps({"ok": True, "files": man["n_files"]}))
    return 0


def cmd_cluster(args) -> int:
    """Reference ``baram cluster`` (src/commands/cluster.rs): form event
    clusters over an embeddings table, optionally LLM-summarize, write
    one EventCluster JSON per cluster."""
    _ray_up(args.num_cpus)
    import ray
    from baram_ray import clustering
    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, "embedding", args.category_col])
    clusters, members = clustering.cluster_events(
        ds, threshold=args.threshold, id_col=args.id_col,
        category_col=args.category_col, return_members=True)
    if args.summarize:
        from baram_ray.summarize import summarize_clusters
        summ = summarize_clusters(clusters, members).to_pandas()
        clusters = clusters.merge(
            summ[["event_id", "title", "summary"]], on="event_id")
    paths = clustering.write_cluster_json(clusters, args.out)
    print(json.dumps({"clusters": len(paths), "out": args.out}))
    return 0


def cmd_ontology(args) -> int:
    """Reference ``baram ontology`` (src/commands/ontology.rs): extract
    relations → triples → RDF files (Turtle / N-Triples)."""
    _ray_up(args.num_cpus)
    import ray
    from baram_ray.ontology import relations_stage, write_rdf
    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    rel = ds.map_batches(relations_stage, batch_format="pyarrow")
    man = write_rdf(rel, args.out, fmt=args.fmt).to_pandas()
    print(json.dumps({"files": len(man),
                      "n_triples": int(man["n_triples"].sum()),
                      "out": args.out}))
    return 0


def cmd_schedule(args) -> int:
    """Print the daily crawl schedule (reference `baram distributed`
    planning surface — scheduler.py)."""
    import json as _json
    from datetime import date as _date

    from baram_ray.scheduler import (CategoryAssigner, RotationScheduler,
                                     daily_rotation)
    d = _date.fromisoformat(args.date) if args.date else _date.today()
    if args.strategy == "rotation":
        sched = RotationScheduler(
            categories_per_slot=args.categories_per_slot)             .generate_daily_schedule(d)
    else:
        a = CategoryAssigner(strategy=args.strategy,
                             categories_per_slot=args.categories_per_slot)
        sched = a.generate_schedule(d, daily_rotation(d))
    if args.json:
        print(sched.to_json())
    else:
        for s in sched.slots:
            print(s.display())
        print(_json.dumps(sched.summary()))
    return 0


def cmd_stats(args) -> int:
    if getattr(args, "prometheus", False):
        from baram_ray.metrics import export_index_metrics
        print(export_index_metrics(args.index), end="")
        return 0
    from baram_ray.index.deletes import tombstoned_ids
    with open(os.path.join(args.index, "meta.json")) as f:
        meta = json.load(f)
    meta["n_tombstoned"] = int(len(tombstoned_ids(args.index)))
    print(json.dumps(meta))
    return 0


def cmd_alias(args) -> int:
    from baram_ray.state.aliases import (alias_list, alias_remove,
                                         alias_set)
    reg = args.registry
    if args.action == "set":
        alias_set(args.name, args.target, registry=reg)
        print(json.dumps({"set": args.name}))
    elif args.action == "rm":
        print(json.dumps({"removed": alias_remove(args.name,
                                                  registry=reg)}))
    else:
        print(json.dumps(alias_list(registry=reg)))
    return 0


def cmd_serve(args) -> int:
    from baram_ray.serve import create_server
    from baram_ray.state.aliases import resolve
    args.index = resolve(args.index)
    srv = create_server(args.index, host=args.host, port=args.port,
                        clusters_dir=args.clusters,
                        corpus_path=args.corpus)
    host, port = srv.server_address[:2]
    print(f"serving {args.index} on http://{host}:{port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def cmd_ann_build(args) -> int:
    """Build (or append to) an ANN index from a parquet embeddings
    table (columns: vec_id, embedding). --kind hnsw = sharded graphs
    (serving latency); --kind pq = residual product-quantized codes
    (beyond-RAM batch scans)."""
    _ray_up(args.num_cpus)
    import ray

    ds = ray.data.read_parquet(args.input,
                               columns=["vec_id", "embedding"])
    if args.kind == "pq":
        if args.append:
            raise SystemExit("--append is HNSW-only; rebuild a PQ "
                             "index (one streaming encode pass)")
        from baram_ray import pq
        meta = pq.pq_build(ds, args.out, m=args.pq_m,
                           n_coarse=args.n_coarse)
    else:
        from baram_ray import hnsw
        if args.append:
            meta = hnsw.hnsw_add(args.out, ds)
        else:
            meta = hnsw.hnsw_build(ds, args.out, M=args.m,
                                   ef_construction=args.ef_construction,
                                   num_shards=args.num_shards)
    print(json.dumps(meta))
    return 0


def cmd_ann_search(args) -> int:
    """Top-k over an ANN index for query vec_ids drawn from the same
    embeddings table (index kind auto-detected from meta.json)."""
    _ray_up(args.num_cpus)
    import ray

    from baram_ray.similarity import _collect_query_vecs
    ds = ray.data.read_parquet(args.input,
                               columns=["vec_id", "embedding"])
    qids = [int(x) for x in args.query_ids.split(",")]
    _, qv = _collect_query_vecs(ds, qids)
    with open(os.path.join(args.index, "meta.json")) as f:
        kind = "pq" if "bytes_per_vec" in json.load(f) else "hnsw"
    if kind == "pq":
        from baram_ray import pq
        res = pq.pq_search(args.index, qv, qids, k=args.k,
                           refine=args.refine, ds=ds,
                           nprobe=args.nprobe).to_pandas() \
            .sort_values(["query_id", "rank"])
    else:
        from baram_ray import hnsw
        res = hnsw.hnsw_search(args.index, qv, qids, k=args.k,
                               ef_search=args.ef)
    for row in res.itertuples(index=False):
        print(json.dumps({"query_id": int(row.query_id),
                          "rank": int(row.rank),
                          "vec_id": int(row.vec_id),
                          "cosine": float(row.cosine)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    from baram_ray.i18n import init_from_env
    init_from_env()                     # BARAM_LANG (reference i18n)
    p = argparse.ArgumentParser(prog="baram_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--fields", default="content,path")
    b.add_argument("--id-cols", default="repo,path,commit")
    b.add_argument("--keep", default="repo,path,lang")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--incremental", action="store_true",
                   help="partition-granular delta build")
    b.add_argument("--since", type=float, default=None,
                   help="only index input files with mtime >= this epoch")
    b.add_argument("--on-duplicate", default="error",
                   choices=["error", "first"])
    b.add_argument("--config", default=None, help="TOML config file")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="BM25 top-k against an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--algorithm", default="auto",
                   choices=["auto", "daat", "wand"])
    s.add_argument("--filter", action="append", metavar="COL=VAL")
    s.add_argument("--range", action="append", metavar="COL=LO:HI")
    s.add_argument("--min-score", type=float, default=None)
    s.add_argument("--after", metavar="SCORE:DOC_ID", default=None,
                   help="search_after cursor (pagination)")
    s.set_defaults(fn=cmd_search)

    c = sub.add_parser("compact", help="merge small segment files")
    c.add_argument("--index", required=True)
    c.add_argument("--target-mb", type=int, default=64)
    c.set_defaults(fn=cmd_compact)

    d = sub.add_parser("delete",
                       help="delete_by_query: tombstone docs matching a "
                            "term query (indexed field or metadata column)")
    d.add_argument("--index", required=True)
    d.add_argument("--field", required=True)
    d.add_argument("--value", required=True)
    d.set_defaults(fn=cmd_delete)

    pg = sub.add_parser("purge",
                        help="expunge tombstoned docs from the postings "
                             "(merge-time delete, rewrites segments)")
    pg.add_argument("--index", required=True)
    pg.set_defaults(fn=cmd_purge)

    sn = sub.add_parser("snapshot", help="point-in-time snapshot of an "
                        "index dir (incremental vs --base)")
    sn.add_argument("index")
    sn.add_argument("dest")
    sn.add_argument("--base", default=None,
                    help="previous snapshot dir — unchanged immutable "
                         "files hardlink instead of copy")
    sn.set_defaults(fn=cmd_snapshot)

    rs = sub.add_parser("restore", help="verify + materialize a "
                        "snapshot at a new index dir (atomic)")
    rs.add_argument("snapshot")
    rs.add_argument("target")
    rs.set_defaults(fn=cmd_restore)

    vs = sub.add_parser("verify-snapshot",
                        help="re-hash a snapshot against its manifest")
    vs.add_argument("snapshot")
    vs.set_defaults(fn=cmd_verify_snapshot)

    al = sub.add_parser("alias", help="index alias registry: a stable "
                        "name atomically repointable at an index dir "
                        "(zero-downtime reindex swap)")
    al.add_argument("action", choices=["set", "rm", "ls"])
    al.add_argument("name", nargs="?")
    al.add_argument("target", nargs="?")
    al.add_argument("--registry",
                    default=os.environ.get("BARAM_ALIAS_REGISTRY",
                                           "/tmp/baram_aliases.json"))
    al.set_defaults(fn=cmd_alias)

    cl = sub.add_parser("cluster", help="greedy event clustering over an "
                                        "embeddings parquet → JSON docs")
    cl.add_argument("--input", required=True)
    cl.add_argument("--out", required=True)
    cl.add_argument("--threshold", type=float, default=0.55)
    cl.add_argument("--id-col", default="vec_id")
    cl.add_argument("--category-col", default="label")
    cl.add_argument("--summarize", action="store_true",
                    help="add LLM title/summary per cluster (fake client)")
    cl.set_defaults(fn=cmd_cluster)

    on = sub.add_parser("ontology", help="relations → triples → RDF files")
    on.add_argument("--input", required=True)
    on.add_argument("--out", required=True)
    on.add_argument("--fmt", default="nt", choices=["nt", "ttl"])
    on.set_defaults(fn=cmd_ontology)

    sv = sub.add_parser("serve", help="REST API over a built index "
                        "(/api/health /api/search /api/explain "
                        "/api/events)")
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--clusters", default=None,
                    help="S9 cluster-JSON dir for /api/events")
    sv.add_argument("--corpus", default=None,
                    help="source documents parquet — enables "
                         "highlight=1 snippets on /api/search")
    sv.set_defaults(fn=cmd_serve)

    st = sub.add_parser("stats", help="index metadata")
    st.add_argument("--index", required=True)
    st.add_argument("--prometheus", action="store_true",
                    help="render build metrics in Prometheus text format")
    st.set_defaults(fn=cmd_stats)

    sc = sub.add_parser("schedule", help="daily crawl schedule plan "
                        "(rotation + category assignment)")
    sc.add_argument("--date", default=None, help="ISO date (default today)")
    sc.add_argument("--strategy", default="rotation",
                    choices=["rotation", "round_robin", "weighted",
                             "load_balanced", "affinity"])
    sc.add_argument("--categories-per-slot", type=int, default=2)
    sc.add_argument("--json", action="store_true")
    sc.set_defaults(fn=cmd_schedule)

    ab = sub.add_parser("ann-build", help="build/append an ANN index "
                        "(hnsw graphs or pq codes) over an embeddings "
                        "parquet")
    ab.add_argument("--input", required=True)
    ab.add_argument("--out", required=True)
    ab.add_argument("--kind", choices=("hnsw", "pq"), default="hnsw")
    ab.add_argument("--m", type=int, default=16)
    ab.add_argument("--ef-construction", type=int, default=128)
    ab.add_argument("--num-shards", type=int, default=None)
    ab.add_argument("--pq-m", type=int, default=16,
                    help="PQ subspaces (bytes/vector)")
    ab.add_argument("--n-coarse", type=int, default=64,
                    help="PQ coarse cells (0 = plain PQ)")
    ab.add_argument("--append", action="store_true",
                    help="add vectors to an existing index")
    ab.set_defaults(fn=cmd_ann_build)

    asrch = sub.add_parser("ann-search", help="ANN top-k for query "
                           "vec_ids from the embeddings table "
                           "(kind auto-detected)")
    asrch.add_argument("--index", required=True)
    asrch.add_argument("--input", required=True)
    asrch.add_argument("--query-ids", required=True,
                       metavar="ID[,ID...]")
    asrch.add_argument("-k", type=int, default=10)
    asrch.add_argument("--ef", type=int, default=64)
    asrch.add_argument("--refine", type=int, default=8,
                       help="PQ exact-rerank multiple")
    asrch.add_argument("--nprobe", type=int, default=None,
                       help="PQ probed cells (default: scan all)")
    asrch.set_defaults(fn=cmd_ann_search)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray
    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
