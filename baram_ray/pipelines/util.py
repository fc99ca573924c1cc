"""Shared helpers for the driver-contract pipelines."""

from __future__ import annotations

import os

import ray
import ray.data


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Column-pruned parquet read of one testdata table."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns)


def broadcast(obj):
    """``ray.put`` once; tasks/actors read the ref (small-side join pattern,
    SURVEY.md J4 — reference broadcast dictionary join,
    src/ontology/linker.rs:581-674)."""
    return ray.put(obj)
