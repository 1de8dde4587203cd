"""Golden tests: Pallas RNN-T lattice scans vs the lax.scan reference."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.rnnt import (_backward_betas, _forward_alphas,
                              _row_tables, rnnt_loss)
from cat_tpu.ops.rnnt_pallas import (backward_betas_pallas,
                                     forward_alphas_pallas)
from cat_tpu.ops.rnnt_simple import rnnt_loss_simple


def _setup(seed=0, N=3, T=9, U=4, V=6):
    rng = np.random.default_rng(seed)
    lp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((N, T, U + 1, V)).astype(np.float32)), -1)
    labels = jnp.asarray(rng.integers(1, V, (N, U)).astype(np.int32))
    ilens = jnp.asarray([T, T - 2, T - 3], jnp.int32)[:N]
    llens = jnp.asarray([U, U - 1, U - 2], jnp.int32)[:N]
    blank_eff, label_eff, _, _ = _row_tables(lp, labels, ilens, llens, 0)
    return lp, labels, ilens, llens, blank_eff, label_eff


def test_alpha_kernel_matches_scan():
    _, _, _, _, blank_eff, label_eff = _setup()
    want = np.asarray(_forward_alphas(blank_eff, label_eff))
    got = np.asarray(forward_alphas_pallas(blank_eff, label_eff,
                                           interpret=True))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_beta_kernel_matches_scan():
    _, _, _, llens, blank_eff, label_eff = _setup(seed=1)
    want, term = _backward_betas(blank_eff, label_eff, llens)
    got = np.asarray(backward_betas_pallas(blank_eff, label_eff, term,
                                           interpret=True))
    assert np.allclose(got, np.asarray(want), atol=1e-4), \
        np.abs(got - np.asarray(want)).max()


def test_rnnt_loss_pallas_impl_end_to_end(monkeypatch):
    """Loss + gradient identical through the env-var switch."""
    lp, labels, ilens, llens, _, _ = _setup(seed=3)

    def f(lp):
        return jnp.sum(rnnt_loss(lp, labels, ilens, llens,
                                 reduction="none"))

    base_l, base_g = jax.value_and_grad(f)(lp)
    monkeypatch.setenv("CAT_TPU_RNNT_IMPL", "pallas")
    pal_l, pal_g = jax.value_and_grad(f)(lp)
    assert np.allclose(float(base_l), float(pal_l), atol=1e-4)
    assert np.allclose(np.asarray(base_g), np.asarray(pal_g), atol=1e-4)


def test_rnnt_simple_pallas_impl_end_to_end(monkeypatch):
    """The fused simple loss shares the scans — check it too."""
    rng = np.random.default_rng(7)
    N, T, U, V = 2, 8, 3, 9
    f_enc = jnp.asarray(rng.standard_normal((N, T, V)).astype(np.float32))
    g_pred = jnp.asarray(
        rng.standard_normal((N, U + 1, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, (N, U)).astype(np.int32))
    ilens = jnp.asarray([T, T - 3], jnp.int32)
    llens = jnp.asarray([U, U - 1], jnp.int32)

    def loss(f_enc, g_pred):
        return rnnt_loss_simple(f_enc, g_pred, labels, ilens, llens,
                                reduction="sum")

    base_l, base_g = jax.value_and_grad(loss, argnums=(0, 1))(f_enc,
                                                              g_pred)
    monkeypatch.setenv("CAT_TPU_RNNT_IMPL", "pallas")
    pal_l, pal_g = jax.value_and_grad(loss, argnums=(0, 1))(f_enc, g_pred)
    assert np.allclose(float(base_l), float(pal_l), atol=1e-4)
    for b, p in zip(base_g, pal_g):
        assert np.allclose(np.asarray(b), np.asarray(p), atol=1e-4)
