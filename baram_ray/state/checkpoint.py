"""Stage manifests + resume — the Ray rebuild of the reference checkpoint.

The reference checkpoints the index build as a JSON file written atomically
(temp + rename) every N batches and deletes it on clean completion
(``src/storage/checkpoint.rs:229-268``, ``src/commands/index.rs:79-108,
311-357``); resume is an anti-join of already-processed ids done *before any
file reads* (``src/commands/index.rs:161-175``).

For a batch Dataset pipeline the unit of resumability is a *stage output
directory*: each stage writes its parquet output, then a manifest
``_manifests/{stage}.json`` recording the input fingerprint, row count,
metrics and duration, written atomically. On resume, a stage whose manifest
exists and matches the current input fingerprint is skipped entirely (the
anti-join, at stage granularity); a stage interrupted mid-write left no
manifest, so its directory is clobbered and rebuilt (idempotent overwrite —
the reference's at-least-once + idempotent-upsert contract,
``src/storage/dedup.rs:979-998``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def fingerprint_paths(paths: list[str]) -> str:
    """Deterministic fingerprint of a set of input files (path + size +
    mtime_ns — an in-place edit that keeps the size must still invalidate)."""
    items = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    items.append((os.path.relpath(fp, p), st.st_size,
                                  st.st_mtime_ns))
        elif os.path.exists(p):
            st = os.stat(p)
            items.append((p, st.st_size, st.st_mtime_ns))
    return hashlib.sha256(json.dumps(items, sort_keys=True).encode()).hexdigest()


class StageManifests:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifests")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def is_done(self, stage: str, input_fp: str) -> bool:
        p = self._path(stage)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                m = json.load(f)
            return m.get("input_fingerprint") == input_fp
        except (json.JSONDecodeError, OSError):
            return False

    def mark_done(self, stage: str, input_fp: str, **metrics) -> None:
        tmp = self._path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "input_fingerprint": input_fp, **metrics}, f)
        os.replace(tmp, self._path(stage))  # atomic (reference src/storage/checkpoint.rs:229-248)

    def get(self, stage: str) -> dict | None:
        """Full manifest payload for a stage (None if absent/corrupt)."""
        p = self._path(stage)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def clear(self, stage: str) -> None:
        p = self._path(stage)
        if os.path.exists(p):
            os.remove(p)


def fresh_dir(path: str) -> str:
    """Clobber + recreate a stage output dir (idempotent overwrite)."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


class StageTimer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = round(time.perf_counter() - self.t0, 3)
        return False
