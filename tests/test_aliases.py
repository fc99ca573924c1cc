"""Index aliases: atomic repointing (the zero-downtime reindex swap),
literal-path precedence, env-registry resolution, and CLI smoke."""

import json
import os
import subprocess
import sys

import pytest

from baram_ray.state.aliases import (alias_list, alias_remove,
                                     alias_set, resolve)


@pytest.fixture()
def reg(tmp_path):
    return str(tmp_path / "aliases.json")


def test_set_resolve_swap_remove(reg, tmp_path):
    a, b = str(tmp_path / "idx_a"), str(tmp_path / "idx_b")
    os.makedirs(a)
    os.makedirs(b)
    alias_set("live", a, registry=reg)
    assert resolve("live", registry=reg) == os.path.abspath(a)
    # atomic repoint — the reindex swap
    alias_set("live", b, registry=reg)
    assert resolve("live", registry=reg) == os.path.abspath(b)
    assert alias_list(registry=reg) == {"live": os.path.abspath(b)}
    assert alias_remove("live", registry=reg)
    assert not alias_remove("live", registry=reg)
    # unknown names pass through untouched
    assert resolve("live", registry=reg) == "live"


def test_literal_path_wins_and_validation(reg, tmp_path):
    d = str(tmp_path / "real")
    os.makedirs(d)
    alias_set(os.path.basename(d), str(tmp_path), registry=reg)
    # resolving the literal existing path ignores the alias
    assert resolve(d, registry=reg) == d
    with pytest.raises(FileNotFoundError):
        alias_set("x", str(tmp_path / "missing"), registry=reg)
    with pytest.raises(ValueError):
        alias_set("a/b", d, registry=reg)


def test_env_registry(reg, tmp_path, monkeypatch):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    monkeypatch.setenv("BARAM_ALIAS_REGISTRY", reg)
    alias_set("envname", d)               # no explicit registry
    assert resolve("envname") == os.path.abspath(d)


def test_cli_alias_roundtrip(reg, tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    env = dict(os.environ, BARAM_ALIAS_REGISTRY=reg,
               PYTHONPATH="/root/repo")
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "baram_ray", "alias", *a],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert json.loads(run("set", "cli", d).stdout) == {"set": "cli"}
    assert json.loads(run("ls").stdout) == {"cli": os.path.abspath(d)}
    assert json.loads(run("rm", "cli").stdout) == {"removed": True}
