"""CLI smoke: the documented `python -m baram_ray` surface works end
to end in fresh processes (each owns its Ray session, as the CLI is
one of the few allowed to). Uses sf0.001 for speed."""

import json
import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> list[dict]:
    out = subprocess.run(
        [sys.executable, "-m", "baram_ray", "--num-cpus", "4", *args],
        capture_output=True, text=True, check=True, cwd=REPO,
        timeout=300)
    return [json.loads(line) for line in out.stdout.splitlines()
            if line.startswith("{")]


def test_cli_build_and_search(tmp_path):
    idx = str(tmp_path / "idx")
    built = _run("build", "--input", f"{SF}/documents.parquet",
                 "--out", idx, "--fields", "text",
                 "--id-cols", "", "--keep", "lang,source")
    # the synthetic docs table draws from a ~31-word pool
    assert built[0]["n_docs"] == 500 and built[0]["n_terms"] > 10
    hits = _run("search", "--index", idx,
                "--query", "data processing", "-k", "5")
    assert len(hits) == 5
    assert [h["rank"] for h in hits] == [1, 2, 3, 4, 5]
    assert all(h["score"] > 0 for h in hits)


def test_cli_ann_build_and_search(tmp_path):
    idx = str(tmp_path / "ann")
    meta = _run("ann-build", "--input", f"{SF}/embeddings.parquet",
                "--out", idx, "--num-shards", "2")
    assert meta[0]["n"] == 500 and meta[0]["shards"] == [0, 1]
    hits = _run("ann-search", "--index", idx,
                "--input", f"{SF}/embeddings.parquet",
                "--query-ids", "0,1", "-k", "3")
    assert len(hits) == 6
    assert {h["query_id"] for h in hits} == {0, 1}
    assert all(h["vec_id"] != h["query_id"] for h in hits)


def test_cli_ann_pq_build_and_search(tmp_path):
    idx = str(tmp_path / "pq")
    meta = _run("ann-build", "--kind", "pq",
                "--input", f"{SF}/embeddings.parquet",
                "--out", idx, "--pq-m", "16", "--n-coarse", "32")
    assert meta[0]["n"] == 500 and meta[0]["bytes_per_vec"] == 18
    hits = _run("ann-search", "--index", idx,      # kind auto-detected
                "--input", f"{SF}/embeddings.parquet",
                "--query-ids", "0,1", "-k", "3", "--nprobe", "8")
    assert len(hits) == 6
    assert {h["query_id"] for h in hits} == {0, 1}
    assert all(h["vec_id"] != h["query_id"] for h in hits)
    assert all(h["rank"] in (1, 2, 3) for h in hits)
