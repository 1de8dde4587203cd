"""Worker + shared fixtures for the 2-process x 4-device multi-host test.

Run standalone as:
    python tests/multiproc_worker.py <proc_id> <num_procs> <port>

Each process owns 4 virtual CPU devices; jax.distributed assembles the
8-device global mesh across the two processes. Every process loads ONLY
its host slice of a deterministic toy dataset via
BucketedLoader(host_index, host_count) — split_by_node semantics,
reference cat/shared/manager.py:100-202 — and parallel.shard_batch
assembles the global batch with make_array_from_process_local_data.
This is the exact code path real multi-host TPU training takes; the
in-process test compares its losses against a single-process run of the
same global schedule.

Importing this module must stay side-effect free (the pytest process
imports the helpers for the single-host reference run); all distributed
setup lives under main().
"""
import os
import sys

import numpy as np


class ToyDS:
    feat_dim = 8

    def __init__(self, n=37, num_classes=6, seed=3):
        rng = np.random.default_rng(seed)
        self.lens = rng.integers(12, 48, n)
        self.labs = [list(rng.integers(1, num_classes, max(1, l // 10)))
                     for l in self.lens]
        # deterministic features so every host materializes identical data
        self.uids = [f"u{i:03d}" for i in range(n)]

    def __len__(self):
        return len(self.lens)

    def frame_length(self, i):
        return int(self.lens[i])

    def label_length(self, i):
        return len(self.labs[i])

    def __getitem__(self, i):
        T = int(self.lens[i])
        rng = np.random.default_rng(1000 + i)
        return (rng.standard_normal((T, self.feat_dim)).astype(np.float32),
                np.asarray(self.labs[i], np.int32))


def run_steps(host_index: int, host_count: int, n_steps: int = 2,
              save_dir: str = None):
    """Build the toy model + loader slice and run n_steps CTC train
    steps on a global 8-device mesh; returns the per-step losses.

    save_dir: when set, after the steps the optimizer state is ZeRO-1
    resharded across the global mesh, the full state is consolidated
    (checkpoint._to_host process-allgather) and saved by process 0,
    then reloaded on EVERY process and compared bitwise against the
    pre-save values — the multi-host save/restore path of VERDICT r2
    item 8 (reference pre-save gather: cat/shared/scheduler.py:50-87)."""
    import jax

    from cat_tpu.ctc.train import init_state, make_train_step
    from cat_tpu.parallel import make_mesh, replicated, shard_batch
    from cat_tpu.utils.data import BucketedLoader
    from cat_tpu.utils.scheduler import build_scheduler

    num_classes = 6
    model_cfg = {"encoder": {"type": "ConformerNet",
                             "kwargs": {"num_cells": 1, "hdim": 32,
                                        "num_heads": 2, "kernel_size": 8,
                                        "dropout_rate": 0.0,
                                        "use_batchnorm": False}}}
    from cat_tpu.ctc.train import build_model

    model = build_model(model_cfg, num_classes=num_classes)
    _, tx = build_scheduler({
        "type": "SchedulerNoam",
        "kwargs": {"dim_model": 32, "warmup_step": 10, "stop_step": 100},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = init_state(model, tx, feat_dim=ToyDS.feat_dim)

    devices = jax.devices()
    assert len(devices) == 8, f"need 8 global devices, have {len(devices)}"
    mesh = make_mesh(num_data=8, num_model=1, devices=devices)

    # replicate all state over the global mesh from host-local values
    rep = replicated(mesh)

    def rep_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), tree)

    state = state.replace(params=rep_tree(state.params),
                          batch_stats=rep_tree(state.batch_stats),
                          opt_state=rep_tree(state.opt_state))

    train_step = make_train_step(model, tx, loss_type="ctc")

    ds = ToyDS(num_classes=num_classes)
    loader = BucketedLoader(ds, frame_budget=256, num_buckets=2,
                            multiple_of=8, seed=11,
                            host_index=host_index, host_count=host_count)
    losses = []
    import jax.numpy as jnp

    with mesh:
        for step, batch in enumerate(loader.epoch(0)):
            if step >= n_steps:
                break
            gb = shard_batch(mesh, batch.asdict())
            state, metrics = train_step(state, gb, jnp.float32(1e-3),
                                        jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))

    if save_dir:
        from cat_tpu.parallel import zero1_shardings
        from cat_tpu.utils.checkpoint import (_to_host, load_checkpoint,
                                              save_checkpoint)

        # reshard opt state ZeRO-1 (collective) so saving must gather
        reshard = jax.jit(
            lambda t: t,
            out_shardings=zero1_shardings(state.opt_state, mesh,
                                          min_size=1))
        state = state.replace(opt_state=reshard(state.opt_state))
        path = os.path.join(save_dir, "mp_ckpt.pt")
        host_state = _to_host({"state": state})  # collective allgather
        if jax.process_index() == 0:
            save_checkpoint(path, host_state)
        # simple shared-fs barrier: wait for the file to appear
        import time

        for _ in range(600):
            if os.path.exists(path):
                break
            time.sleep(0.1)
        ck = load_checkpoint(path)
        ok = True
        for a, b in zip(jax.tree_util.tree_leaves(host_state),
                        jax.tree_util.tree_leaves(ck)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                ok = False
        print("SAVEOK" if ok else "SAVEFAIL", flush=True)
    return losses


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_procs,
                               process_id=proc_id)
    assert jax.process_count() == num_procs
    assert len(jax.local_devices()) == 4
    save_dir = sys.argv[4] if len(sys.argv) > 4 else None
    losses = run_steps(jax.process_index(), num_procs,
                       save_dir=save_dir)
    print("LOSSES", " ".join(f"{v:.8f}" for v in losses), flush=True)


if __name__ == "__main__":
    main()
