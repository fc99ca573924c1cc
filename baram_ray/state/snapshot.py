"""Index snapshot / restore — the operational surface the reference
gets from OpenSearch's snapshot API (repository snapshots of immutable
segment files; the reference operates it via its docker/k8s runbooks).

Model: an index directory is (a) immutable, generation-prefixed data
files (segments/ termdict/ forward/ docs/ parquet — a committed file
is never rewritten, the delta-build contract in ``index/build.py``)
plus (b) tiny mutable commit state (``meta.json``, ``_manifests/*``).
A snapshot therefore:

- captures a CONSISTENT point-in-time view by reading the commit
  state FIRST and copying it into the snapshot, then copying data
  files — a concurrent delta commit can only add files the captured
  manifests don't reference, never mutate captured ones;
- is written atomically (``dest.tmp`` → rename), with a
  ``SNAPSHOT.json`` manifest of every file's size + sha256;
- is INCREMENTAL against a previous snapshot: a data file whose
  (relpath, size, sha256) already exists in ``base`` is HARDLINKED
  instead of copied (the OpenSearch incremental behavior — unchanged
  immutable segments cost zero bytes), falling back to copy across
  filesystems.

``verify_snapshot`` re-hashes every file; ``restore_index`` verifies,
materializes into ``target.tmp`` and renames — a crashed restore never
leaves a half-index at ``target``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

SNAPSHOT_MANIFEST = "SNAPSHOT.json"

# mutable commit state, captured first for the consistent cut
_STATE_FILES = ("meta.json",)
_STATE_DIRS = ("_manifests",)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            out.append(os.path.relpath(p, root))
    return sorted(out)


def _load_manifest(snap_dir: str) -> dict:
    with open(os.path.join(snap_dir, SNAPSHOT_MANIFEST)) as f:
        return json.load(f)


def snapshot_index(index_dir: str, dest: str,
                   base: str | None = None) -> dict:
    """Snapshot ``index_dir`` into ``dest`` (atomic; must not exist).
    ``base``: a previous snapshot directory — files already present
    there with identical size+sha are hardlinked, not copied. Returns
    the written manifest."""
    if os.path.exists(dest):
        raise FileExistsError(f"snapshot dest exists: {dest}")
    base_files: dict[str, dict] = {}
    if base is not None:
        base_files = _load_manifest(base)["files"]
    tmp = dest + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    files: dict[str, dict] = {}

    def _capture(rel: str) -> None:
        src = os.path.join(index_dir, rel)
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        size = os.path.getsize(src)
        sha = _sha256(src)
        prev = base_files.get(rel)
        linked = False
        if (prev is not None and prev["size"] == size
                and prev["sha256"] == sha):
            try:
                os.link(os.path.join(base, rel), dst)
                linked = True
            except OSError:          # cross-device → plain copy
                pass
        if not linked:
            shutil.copy2(src, dst)
        files[rel] = {"size": size, "sha256": sha,
                      "reused": linked}

    # commit state first — the consistent cut
    state_rels = [f for f in _STATE_FILES
                  if os.path.exists(os.path.join(index_dir, f))]
    for d in _STATE_DIRS:
        dd = os.path.join(index_dir, d)
        if os.path.isdir(dd):
            state_rels.extend(os.path.join(d, n)
                              for n in sorted(os.listdir(dd)))
    for rel in state_rels:
        _capture(rel)
    # then the immutable data files
    for rel in _walk_files(index_dir):
        if rel not in files:
            _capture(rel)

    manifest = {
        "source": os.path.abspath(index_dir),
        "base": None if base is None else os.path.abspath(base),
        "n_files": len(files),
        "n_reused": sum(1 for v in files.values() if v["reused"]),
        "total_bytes": sum(v["size"] for v in files.values()),
        "files": files,
    }
    with open(os.path.join(tmp, SNAPSHOT_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, dest)
    return manifest


def verify_snapshot(snap_dir: str) -> dict:
    """Re-hash every file against the manifest; raises ValueError on
    any missing/extra/corrupt file. Returns the manifest."""
    man = _load_manifest(snap_dir)
    problems = []
    for rel, info in man["files"].items():
        p = os.path.join(snap_dir, rel)
        if not os.path.exists(p):
            problems.append(f"missing: {rel}")
            continue
        if os.path.getsize(p) != info["size"]:
            problems.append(f"size mismatch: {rel}")
            continue
        if _sha256(p) != info["sha256"]:
            problems.append(f"sha256 mismatch: {rel}")
    on_disk = set(_walk_files(snap_dir)) - {SNAPSHOT_MANIFEST}
    extra = on_disk - set(man["files"])
    problems.extend(f"unexpected file: {rel}" for rel in sorted(extra))
    if problems:
        raise ValueError("snapshot verification failed: "
                         + "; ".join(problems[:10]))
    return man


def restore_index(snap_dir: str, target: str) -> dict:
    """Verify ``snap_dir`` then materialize it at ``target``
    (atomic; must not exist). Returns the manifest."""
    if os.path.exists(target):
        raise FileExistsError(f"restore target exists: {target}")
    man = verify_snapshot(snap_dir)
    tmp = target + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for rel in man["files"]:
        src = os.path.join(snap_dir, rel)
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        mutable = (rel in _STATE_FILES
                   or any(rel.startswith(d + os.sep)
                          for d in _STATE_DIRS))
        if mutable:
            # commit state gets rewritten by later delta builds —
            # always COPY so the restored index can never mutate the
            # snapshot through a shared inode
            shutil.copy2(src, dst)
            continue
        try:
            os.link(src, dst)          # immutable files: share inodes
        except OSError:
            shutil.copy2(src, dst)
    os.rename(tmp, target)
    return man
