"""Dataset registry: data/metainfo.json (resolvedata.py equivalent).

Counterpart of /root/reference/cat/utils/data/resolvedata.py: a single
JSON file mapping dataset names to their prepared artifacts so recipes
reference data by name instead of path.

Format:
  {"<name>": {"scp": ..., "trans": ..., "packed": ...}, ...}
"""
from __future__ import annotations

import json
import os

F_DATAINFO = "data/metainfo.json"


def load(root="."):
    path = os.path.join(root, F_DATAINFO)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def save(info, root="."):
    path = os.path.join(root, F_DATAINFO)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(info, f, indent=2, sort_keys=True)


def register(name, root=".", **artifacts):
    """Register/update artifacts for a dataset name.

    register("train_960", scp="data/train_960/wav.scp",
             trans="data/train_960/text", packed="pkl/train_960")"""
    info = load(root)
    entry = info.setdefault(name, {})
    for k, v in artifacts.items():
        entry[k] = v
    save(info, root)
    return entry


def resolve(name, key=None, root="."):
    """Look up a dataset (or one artifact of it) by name."""
    info = load(root)
    if name not in info:
        raise KeyError(
            f"dataset '{name}' not in {F_DATAINFO}; known: "
            f"{sorted(info)}")
    return info[name] if key is None else info[name][key]
