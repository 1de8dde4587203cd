"""Gradient accumulation: fold-N micro-batches reproduce the single
large-batch update (manager.py:660-676 no_sync fold semantics, with
weight-aware averaging)."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ctc import train as ctc_train
from cat_tpu.utils.scheduler import build_scheduler


CFG = {"encoder": {"type": "LSTM",
                   "kwargs": {"hdim": 16, "num_layers": 1,
                              "bidirectional": False,
                              "dropout_rate": 0.0}}}
V = 5
F = 8


def make_batch(rng, N, T=12, U=3, weights=None):
    feats = rng.standard_normal((N, T, F)).astype(np.float32)
    labels = rng.integers(1, V, (N, U)).astype(np.int32)
    flens = np.full((N,), T, np.int32)
    llens = np.full((N,), U, np.int32)
    w = np.ones((N,), np.float32) if weights is None else weights
    return dict(feats=feats, feat_lengths=flens, labels=labels,
                label_lengths=llens, weight=w)


def _build(fold):
    model = ctc_train.build_model(CFG, num_classes=V)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 10**6},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    if fold > 1:
        tx = ctc_train.accum_tx(tx, fold, grad_clip=5.0)
    state = ctc_train.init_state(model, tx, feat_dim=F,
                                 rng=jax.random.PRNGKey(7))
    step = ctc_train.make_train_step(model, tx, "ctc",
                                     grad_accum_fold=fold)
    return model, state, step


def test_fold4_matches_batch32():
    rng = np.random.default_rng(0)
    big = make_batch(rng, 32)

    # two optimizer updates each way (second uses fresh data)
    big2 = make_batch(rng, 32)
    _, state_a, step_a = _build(fold=1)
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(0)
    state_a, _ = step_a(state_a, big, lr, key)
    state_a, _ = step_a(state_a, big2, lr, key)

    _, state_b, step_b = _build(fold=4)
    for src in (big, big2):
        for i in range(4):
            micro = {k: v[i * 8:(i + 1) * 8] for k, v in src.items()}
            state_b, m = step_b(state_b, micro, lr, key)
        assert bool(m["applied"])

    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_fold_weight_aware():
    """A fold whose last micro-batch is all padding (weight 0) must
    equal the mean over only the real sequences."""
    rng = np.random.default_rng(1)
    real = make_batch(rng, 16)
    pad = make_batch(rng, 8, weights=np.zeros((8,), np.float32))

    _, state_a, step_a = _build(fold=1)
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(0)
    state_a, _ = step_a(state_a, real, lr, key)

    _, state_b, step_b = _build(fold=3)
    for micro in ({k: v[:8] for k, v in real.items()},
                  {k: v[8:] for k, v in real.items()}, pad):
        state_b, m = step_b(state_b, micro, lr, key)
    assert bool(m["applied"])

    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_no_update_mid_fold():
    _, state, step = _build(fold=4)
    rng = np.random.default_rng(2)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, m = step(state, make_batch(rng, 8), jnp.float32(1e-3),
                    jax.random.PRNGKey(0))
    assert not bool(m["applied"])
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
