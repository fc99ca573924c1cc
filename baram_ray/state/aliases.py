"""Index aliases — the OpenSearch alias registry (atomic pointer from
a stable name to the current physical index directory; the operational
primitive behind zero-downtime reindex/swap: build the new index,
repoint the alias, readers never see a half state).

The registry is one JSON file updated atomically (tmp + rename); a
swap is a single rename-visible write. Resolution is used by the CLI
``search`` / ``serve`` / ``snapshot`` entry points: a name that exists
in the registry resolves to its target, anything else is taken as a
literal path — so aliases are opt-in and never shadow real paths
(a literal existing directory wins over an alias of the same name).
"""

from __future__ import annotations

import json
import os

DEFAULT_REGISTRY = os.path.join("/tmp", "baram_aliases.json")


def _registry(registry: str | None) -> str:
    """None → $BARAM_ALIAS_REGISTRY or the default path (env read at
    call time so CLI subprocesses agree)."""
    return registry or os.environ.get("BARAM_ALIAS_REGISTRY",
                                      DEFAULT_REGISTRY)


def _load(registry: str) -> dict[str, str]:
    try:
        with open(registry) as f:
            return dict(json.load(f))
    except FileNotFoundError:
        return {}


def _store(registry: str, data: dict[str, str]) -> None:
    tmp = registry + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, registry)


def alias_set(name: str, index_dir: str,
              registry: str | None = None) -> dict:
    """Point ``name`` at ``index_dir`` (create or atomic repoint)."""
    registry = _registry(registry)
    if os.sep in name:
        raise ValueError(f"alias name must not contain {os.sep!r}: "
                         f"{name!r}")
    if not os.path.isdir(index_dir):
        raise FileNotFoundError(f"index dir missing: {index_dir}")
    data = _load(registry)
    data[name] = os.path.abspath(index_dir)
    _store(registry, data)
    return data


def alias_remove(name: str,
                 registry: str | None = None) -> bool:
    registry = _registry(registry)
    data = _load(registry)
    existed = data.pop(name, None) is not None
    if existed:
        _store(registry, data)
    return existed


def alias_list(registry: str | None = None) -> dict[str, str]:
    return _load(_registry(registry))


def resolve(name_or_path: str,
            registry: str | None = None) -> str:
    """Alias name → target dir; a literal existing directory always
    wins (aliases never shadow real paths); unknown names pass
    through unchanged (the caller's open error stays informative)."""
    if os.path.isdir(name_or_path):
        return name_or_path
    return _load(_registry(registry)).get(name_or_path, name_or_path)
