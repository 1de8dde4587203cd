"""NaN/Inf skip-update guard in the default train steps (VERDICT r2
item 7; reference behavior: cat/shared/manager_wo.py:613-641 skips the
optimizer update when any grad is non-finite).

A poisoned batch must leave params + opt_state untouched and set the
`skipped` counter; a clean batch must still train."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.utils.scheduler import build_scheduler

SCHED = {"type": "SchedulerEarlyStop",
         "kwargs": {"min_step": 10, "stop_lr": 1e-5},
         "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}}


def _ctc_batch(poison=False):
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 24, 8)).astype(np.float32)
    if poison:
        feats[0, 3, 2] = np.nan
    return {
        "feats": jnp.asarray(feats),
        "feat_lengths": jnp.asarray([24, 20], jnp.int32),
        "labels": jnp.asarray([[1, 2, 1], [2, 1, 0]], jnp.int32),
        "label_lengths": jnp.asarray([3, 2], jnp.int32),
        "weight": jnp.asarray([1.0, 1.0], jnp.float32),
    }


def _leaves_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


@pytest.mark.parametrize("fold", [1, 2])
def test_ctc_nan_guard(fold):
    from cat_tpu.ctc import train as ctc_train

    cfg = {"encoder": {"type": "LSTM",
                       "kwargs": {"hdim": 16, "num_layers": 1,
                                  "dropout_rate": 0.0}}}
    model = ctc_train.build_model(cfg, num_classes=4)
    _, tx = build_scheduler(SCHED)
    if fold > 1:
        tx = ctc_train.accum_tx(tx, fold, 5.0)
    state = ctc_train.init_state(model, tx, 8)
    step = ctc_train.make_train_step(model, tx, "ctc",
                                     grad_accum_fold=fold)
    key = jax.random.PRNGKey(0)

    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, m = step(state, _ctc_batch(poison=True),
                        jnp.float32(1e-3), key)
    assert int(m["skipped"]) == 1
    assert _leaves_equal(p0, new_state.params)
    if fold == 1:
        # fold>1 legitimately mutates accumulator bookkeeping (count)
        assert not np.isfinite(float(m["loss"])) or float(m["loss"]) == 0

    # clean batches still train: after `fold` micro-steps params move
    state = new_state
    for _ in range(fold):
        state, m = step(state, _ctc_batch(), jnp.float32(1e-3), key)
        assert int(m["skipped"]) == 0
    assert np.isfinite(float(m["loss"]))
    assert not _leaves_equal(p0, state.params)
    # the poisoned micro-batch must not have contaminated the fold
    # accumulator: post-update params are all finite
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(state.params))


def test_rnnt_nan_guard():
    from cat_tpu.rnnt import train as rnnt_train

    cfg = {
        "encoder": {"type": "LSTM",
                    "kwargs": {"hdim": 16, "num_layers": 1,
                               "dropout_rate": 0.0}},
        "predictor": {"type": "LSTMPredictor",
                      "kwargs": {"hdim": 8, "num_layers": 1}},
        "joiner": {"type": "JointNet", "kwargs": {"hdim": 8}},
    }
    model = rnnt_train.build_model(cfg, num_classes=4)
    _, tx = build_scheduler(SCHED)
    state = rnnt_train.init_state(model, tx, 8)
    step = rnnt_train.make_train_step(model, tx)
    key = jax.random.PRNGKey(0)

    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, m = step(state, _ctc_batch(poison=True),
                        jnp.float32(1e-3), key)
    assert int(m["skipped"]) == 1
    assert _leaves_equal(p0, new_state.params)

    new_state, m = step(new_state, _ctc_batch(), jnp.float32(1e-3), key)
    assert int(m["skipped"]) == 0
    assert not _leaves_equal(p0, new_state.params)
