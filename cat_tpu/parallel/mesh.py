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


def tensor_parallel_shardings(params, mesh: Mesh):
    """Megatron-style tensor-parallel NamedShardings for the conformer
    zoo over the mesh's 'model' axis (the scaling-book TP recipe: pick
    a mesh, annotate weight shardings, let GSPMD insert the
    all-gathers/reduce-scatters on ICI).

    Sharded pairs (column- then row-parallel, so the activation stays
    sharded between them and only one collective per block is needed):
      - FF up-projection kernel (D, 4D) → (None, 'model'), its bias
        ('model'); FF down-projection (4D, D) → ('model', None)
      - attention q/k/v/pos kernels (D, H, Dh) → heads on 'model';
        their biases and the rel-pos u/v biases (H, Dh) → ('model', …);
        out-projection (H, Dh, D) → ('model', None, None)
      - classifier kernel (D, V) → vocab-sharded (None, 'model')
    Everything else (LayerNorm, conv module, subsampling) replicates.
    Specs are right-aligned so scan-stacked layer params (leading cell
    axis from scan_layers=True) shard identically. Dims not divisible
    by the axis size fall back to replication.
    """
    nmodel = mesh.shape.get("model", 1)

    def spec_for(path, x):
        if nmodel <= 1:
            return P()
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        nd = np.ndim(x)

        def right(tail):
            return [None] * (nd - len(tail)) + list(tail)

        spec = None
        attn = "MultiHeadAttention" in name
        if "FFModule" in name or "ConvModule" in name:
            if name.endswith("Dense_0/kernel"):
                spec = right([None, "model"])
            elif name.endswith("Dense_0/bias"):
                spec = right(["model"])
            elif "FFModule" in name and name.endswith("Dense_1/kernel"):
                spec = right(["model", None])
        elif attn:
            if any(name.endswith(f"{p}/kernel")
                   for p in ("q", "k", "v", "pos")):
                spec = right([None, "model", None])
            elif name.endswith("out/kernel"):
                spec = right(["model", None, None])
            elif (name.endswith("u_bias") or name.endswith("v_bias")
                  or any(name.endswith(f"{p}/bias")
                         for p in ("q", "k", "v"))):
                spec = right(["model", None])
        elif name == "classifier/kernel":
            spec = right([None, "model"])
        if spec is not None:
            shape = np.shape(x)
            for dim, s in enumerate(spec):
                if s == "model" and shape[dim] % nmodel != 0:
                    spec = None
                    break
        return P(*spec) if spec is not None else P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec_for(p, x)), params)


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
