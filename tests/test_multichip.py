"""Multi-chip SPMD tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.parallel import (batch_sharding, make_mesh, replicated,
                              shard_batch, zero1_shardings)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_mesh_and_sharding():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    batch = {"feats": np.ones((16, 10, 4), np.float32),
             "lens": np.ones((16,), np.int32)}
    sb = shard_batch(mesh, batch)
    assert sb["feats"].sharding.spec[0] == "data"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_spmd_training_step_matches_single_device():
    """The same CTC train step must produce the same loss whether run
    sharded over 8 devices or on one (GSPMD correctness)."""
    from cat_tpu.ctc.train import (build_model, init_state,
                                   make_train_step)
    from cat_tpu.utils.scheduler import build_scheduler

    model = build_model(
        {"encoder": {"type": "LSTM",
                     "kwargs": {"hdim": 12, "num_layers": 1,
                                "bidirectional": True,
                                "dropout_rate": 0.0}}},
        num_classes=5)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 1000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = init_state(model, tx, feat_dim=4)
    step = make_train_step(model, tx, "ctc", specaug_cfg=None)
    rng = np.random.default_rng(0)
    batch_np = {
        "feats": rng.standard_normal((16, 20, 4)).astype(np.float32),
        "feat_lengths": np.full((16,), 20, np.int32),
        "labels": rng.integers(1, 5, (16, 3)).astype(np.int32),
        "label_lengths": np.full((16,), 3, np.int32),
        "weight": np.ones((16,), np.float32),
    }
    key = jax.random.PRNGKey(0)
    # The step donates its state buffers, so build the sharded copy
    # BEFORE running the single-device step (which deletes `state`).
    mesh = make_mesh()
    state_host = jax.tree_util.tree_map(np.asarray, state)
    state_sh = state_host.replace(
        params=jax.device_put(state_host.params, jax.tree_util.tree_map(
            lambda _: replicated(mesh), state_host.params)),
        opt_state=jax.device_put(state_host.opt_state,
                                 zero1_shardings(state_host.opt_state, mesh)))
    batch_sh = shard_batch(mesh, batch_np)
    # single-device
    s1, m1 = step(state, batch_np, jnp.float32(1e-3), key)
    # sharded
    s2, m2 = step(state_sh, batch_sh, jnp.float32(1e-3), key)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    # params after update agree
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               atol=1e-5)
