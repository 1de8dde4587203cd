"""Mesh + sharding helpers.

Layout policy (SURVEY.md §2.3):
- 'data' axis: batch dimension of inputs/activations; gradients are
  reduced across it by GSPMD (the DDP allreduce equivalent).
- 'model' axis (optional, default 1): reserved for sharding encoder
  FFN/attention weights if a config exceeds one chip's HBM.
- ZeRO-1: optimizer moments sharded along 'data' on their largest
  divisible axis; params stay replicated (same trade as the reference's
  ZeroRedundancyOptimizer).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model <= n, (num_data, num_model, n)
    devs = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) along 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process: a plain device_put. Multi-process (real multi-host
    SPMD): each process holds only its contiguous batch slice (see
    BucketedLoader host_index/host_count) and the global jax.Array is
    assembled from the per-process shards — the host_local→global step
    the reference never needed because DDP keeps per-rank batches."""
    multiproc = jax.process_count() > 1

    def put(x):
        sh = batch_sharding(mesh, np.ndim(x))
        if multiproc:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def zero1_shardings(pytree, mesh: Mesh, min_size: int = 2 ** 16):
    """ZeRO-1 sharding specs for an optimizer-state pytree: arrays larger
    than min_size are sharded along 'data' on their first axis divisible
    by the axis size; everything else is replicated."""
    ndata = mesh.shape["data"]

    def rule(x):
        shape = np.shape(x)
        if np.size(x) >= min_size:
            for dim, d in enumerate(shape):
                if d % ndata == 0 and d >= ndata:
                    spec = [None] * len(shape)
                    spec[dim] = "data"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, pytree)
