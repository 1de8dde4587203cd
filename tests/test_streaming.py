"""Tests for CUSIDE-style streaming (chunking, SimuNet, unified loss)."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ctc.streaming import (SimuNet, UnifiedEncoder, chunk_infer,
                                   make_chunks, make_unified_loss_fn)
from cat_tpu.models import encoders


def test_make_chunks_geometry():
    N, T, F = 2, 20, 3
    x = jnp.asarray(np.arange(N * T * F, dtype=np.float32).reshape(
        N, T, F))
    win, C = make_chunks(x, chunk=8, left=4, right=2)
    assert C == 3  # ceil(20/8)
    assert win.shape == (N, 3, 4 + 8 + 2, F)
    w = np.asarray(win)
    # chunk 0: left context OOB → zeros; middle = frames 0..7
    np.testing.assert_allclose(w[0, 0, :4], 0.0)
    np.testing.assert_allclose(w[0, 0, 4:12], np.asarray(x)[0, :8])
    np.testing.assert_allclose(w[0, 0, 12:14], np.asarray(x)[0, 8:10])
    # chunk 1: left = frames 4..7, middle 8..15, right 16..17
    np.testing.assert_allclose(w[0, 1, :4], np.asarray(x)[0, 4:8])
    # chunk 2: right context OOB → zeros
    np.testing.assert_allclose(w[0, 2, 12:14], 0.0)


def _unified(chunk=8, left=8, right=4, V=5, F=6):
    enc = encoders.LSTM(hdim=8, num_layers=1, bidirectional=True,
                        num_classes=V, dropout_rate=0.0)
    simu = SimuNet(feat_dim=F, hidden=8, right=right)
    return UnifiedEncoder(encoder=enc, simu=simu, chunk=chunk, left=left,
                          right=right)


def test_unified_loss_modes():
    rng = np.random.default_rng(0)
    N, T, F, V = 2, 24, 6, 5
    model = _unified(F=F, V=V)
    batch = dict(
        feats=jnp.asarray(rng.standard_normal((N, T, F)).astype(
            np.float32)),
        feat_lengths=jnp.asarray([24, 16], jnp.int32),
        labels=jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32),
        label_lengths=jnp.asarray([2, 1], jnp.int32),
        weight=jnp.ones((N,), jnp.float32))
    variables = jax.jit(lambda k: model.init(
        k, batch["feats"], batch["feat_lengths"],
        method=model.full_forward))(jax.random.PRNGKey(0))
    # also initialize the chunked path params (simu net)
    variables = jax.jit(lambda k: model.init(
        k, batch["feats"], batch["feat_lengths"],
        method=model.chunk_forward))(jax.random.PRNGKey(0))
    params = variables["params"]
    for future in ("real", "none", "simu"):
        loss_fn = make_unified_loss_fn(model, future=future)
        loss, (_, lf, lc, l1) = jax.jit(
            lambda p: loss_fn(p, {}, batch, jax.random.PRNGKey(1),
                              False))(params)
        assert np.isfinite(float(loss)), future
        assert float(lf) > 0 and float(lc) > 0
        if future == "simu":
            assert float(l1) > 0
    # gradient flows
    loss_fn = make_unified_loss_fn(model, future="simu")
    g = jax.jit(jax.grad(lambda p: loss_fn(
        p, {}, batch, jax.random.PRNGKey(1), True)[0]))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)


def test_chunk_infer_shapes():
    rng = np.random.default_rng(1)
    N, T, F, V = 2, 32, 6, 5
    model = _unified(F=F, V=V)
    feats = jnp.asarray(rng.standard_normal((N, T, F)).astype(np.float32))
    lens = jnp.asarray([32, 20], jnp.int32)
    variables = jax.jit(lambda k: model.init(
        k, feats, lens, method=model.chunk_forward))(jax.random.PRNGKey(0))
    out, out_lens = chunk_infer(model, variables, feats, lens)
    assert out.shape[0] == N and out.shape[-1] == V
    assert int(np.asarray(out_lens).max()) <= out.shape[1]
