"""Multi-host SPMD helpers.

Replaces the reference's NCCL/TCP rendezvous + per-rank spawning
(/root/reference/cat/shared/coreutils.py:214-242,493-504) with JAX's
single-program multi-host model: one process per host,
jax.distributed.initialize, global meshes spanning all hosts, and
host-local data feeding via Batch sharding (utils.data multiple_of =
global data-axis size; data_sharded.ShardedSpeechDataset host_index /
host_count for the split_by_node semantics).
"""
from __future__ import annotations

import numpy as np

import jax


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize multi-host JAX (no-op when single-host). Mirrors
    jax.distributed.initialize's env-driven auto-config on TPU pods."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_primary():
    return jax.process_index() == 0


def all_gather_host_values(value):
    """Gather a small host scalar/array from every process (the
    gather_object/broadcast_object_list equivalent for WER counts,
    cat/ctc/train.py:237-250)."""
    if jax.process_count() == 1:
        return [value]
    from jax.experimental import multihost_utils

    arr = np.asarray(value)
    gathered = multihost_utils.process_allgather(arr)
    return list(gathered)


def host_sum(value):
    """Sum a host-side metric across processes."""
    vals = all_gather_host_values(value)
    return np.sum(np.asarray(vals), axis=0)


def all_gather_host_objects(obj):
    """Gather an arbitrary picklable host object from every process
    (gather_object role, reference cat/ctc/train.py:237-250): pickle →
    uint8, pad to the global max length, allgather, unpickle."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    raw = np.frombuffer(pickle.dumps(obj, protocol=4), np.uint8)
    n = np.asarray([raw.size], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    cap = int(sizes.max())
    buf = np.zeros((cap,), np.uint8)
    buf[: raw.size] = raw
    gathered = multihost_utils.process_allgather(buf)
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes())
            for i in range(len(sizes))]
