"""Checkpointing: save/load/resume, best/last-N retention, averaging.

Counterpart of the reference's Manager.save + CheckManager
(/root/reference/cat/shared/manager.py:414-450, 719-821 — rank-0 torch
saves with an append-only checkpoint.list index) and avgmodel.py
(cat/utils/avgmodel.py:20-111 best-N / last-N averaging). Here checkpoints
are host numpy pytrees (pickle), written once per eval point. Multi-host:
ZeRO-sharded leaves are not fully addressable from one process, so
_to_host consolidates them with a process allgather before pickling (the
reference's pre-save ZeRO gather, cat/shared/scheduler.py:50-87);
single-process trees take the plain np.asarray path.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

import jax


def _to_host(tree):
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)


def save_checkpoint(path, state: dict):
    """state: arbitrary pytree dict (params/opt_state/step/...)."""
    host = _to_host(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class CheckpointManager:
    """Append-only `checkpoint.list` index + retention policy."""

    def __init__(self, ckpt_dir, keep_last=5, keep_best=3):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        self.index_path = os.path.join(ckpt_dir, "checkpoint.list")
        self.keep_last = keep_last
        self.keep_best = keep_best
        self.entries = []  # (name, metric, step)
        if os.path.exists(self.index_path):
            with open(self.index_path) as f:
                for line in f:
                    parts = line.split("\t")
                    if len(parts) == 3:
                        self.entries.append(
                            (parts[0], float(parts[1]), int(parts[2])))

    def path(self, name):
        return os.path.join(self.dir, name)

    def save(self, state: dict, metric: float, step: int, epoch: int):
        name = f"checkpoint.{epoch:03d}e{step:08d}s.pt"
        save_checkpoint(self.path(name), state)
        self.entries.append((name, float(metric), int(step)))
        with open(self.index_path, "a") as f:
            f.write(f"{name}\t{metric:.8f}\t{step}\n")
        self._prune()
        return name

    def _prune(self):
        if not self.entries:
            return
        by_recency = [e[0] for e in self.entries[-self.keep_last:]]
        by_metric = [e[0] for e in sorted(self.entries,
                                          key=lambda e: e[1])
                     [: self.keep_best]]
        keep = set(by_recency) | set(by_metric)
        for name, _, _ in self.entries:
            p = self.path(name)
            if name not in keep and os.path.exists(p):
                os.remove(p)

    def best(self):
        avail = [e for e in self.entries if os.path.exists(self.path(e[0]))]
        if not avail:
            return None
        return min(avail, key=lambda e: e[1])[0]

    def last(self):
        avail = [e for e in self.entries if os.path.exists(self.path(e[0]))]
        return avail[-1][0] if avail else None


def average_checkpoints(paths, key="params"):
    """Uniform parameter averaging (avgmodel.py:20-111)."""
    acc = None
    n = 0
    for p in paths:
        ck = load_checkpoint(p)
        tree = ck[key] if key in ck else ck
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda x: x.astype(np.float64), tree)
        else:
            acc = jax.tree_util.tree_map(lambda a, x: a + x, acc, tree)
        n += 1
    return jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32), acc)
