"""Core helpers shared by build + pipelines."""

from __future__ import annotations

import math
import os


def input_bytes(paths: list[str] | str) -> int:
    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def auto_num_blocks(paths: list[str] | str, cpus: int | None = None) -> int | None:
    """Size-aware ``override_num_blocks`` for ``read_parquet``.

    Ray's default read splitting targets ~2×CPU blocks regardless of input
    size, which turns a 1 MB table into 64 micro-blocks whose per-task
    overhead dominates every downstream shuffle. For small inputs, cap
    blocks at ~1 block / 256 KiB (compressed); for large inputs return
    ``None`` so Ray's own 128 MiB-target splitting governs — the right
    behavior at 100 TB where block count must grow with data, not CPUs.
    """
    if cpus is None:
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
    total = input_bytes(paths)
    by_size = math.ceil(total / (16 << 20)) if total else 1
    if by_size >= 2 * cpus:
        return None                       # big data: Ray's default is right
    return max(1, min(2 * cpus, math.ceil(total / (256 << 10))))
