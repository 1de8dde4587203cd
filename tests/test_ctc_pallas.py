"""Golden tests: Pallas CTC scans vs the lax.scan reference."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ops import ctc as ctc_mod
from cat_tpu.ops.ctc import (_emissions, _forward_alphas,
                             _lattice_tables, _shift_left, ctc_loss)
from cat_tpu.ops.ctc_pallas import (backward_betas_pallas,
                                    forward_alphas_pallas)
from cat_tpu.ops.semiring import LOG_EPS, logaddexp3


def _setup(seed=0, N=3, T=11, U=4, V=7):
    rng = np.random.default_rng(seed)
    lp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((N, T, V)).astype(np.float32)), -1)
    labels = jnp.asarray(rng.integers(1, V, (N, U)).astype(np.int32))
    ilens = jnp.asarray([T, T - 2, T - 4], jnp.int32)[:N]
    llens = jnp.asarray([U, U - 1, U - 2], jnp.int32)[:N]
    S = 2 * U + 1
    ext, svalid, allow2 = _lattice_tables(labels, llens, 0, S)
    em = _emissions(lp, ext, svalid, ilens, 0)
    return lp, labels, ilens, llens, em, allow2


def test_alpha_kernel_matches_scan():
    _, _, _, _, em, allow2 = _setup()
    want = np.asarray(_forward_alphas(em, allow2))
    got = np.asarray(forward_alphas_pallas(em, allow2, interpret=True))
    assert np.allclose(got, want, atol=1e-4), \
        np.abs(got - want).max()


def test_beta_kernel_matches_scan():
    _, _, _, llens, em, allow2 = _setup()
    T, N, S = em.shape
    idx1 = 2 * llens
    idx2 = idx1 - 1
    s_idx = jnp.arange(S)
    beta_last = jnp.where(
        (s_idx[None, :] == idx1[:, None])
        | ((s_idx[None, :] == idx2[:, None]) & (idx2 >= 0)[:, None]),
        0.0, LOG_EPS)
    allow2_dst = _shift_left(jnp.where(allow2, 0.0, LOG_EPS), 2) == 0.0

    def stepb(beta, em_next_t):
        b = jnp.maximum(em_next_t + beta, LOG_EPS)
        b1 = _shift_left(b, 1)
        b2 = jnp.where(allow2_dst, _shift_left(b, 2), LOG_EPS)
        return (jnp.maximum(logaddexp3(b, b1, b2), LOG_EPS),) * 2

    _, head = jax.lax.scan(stepb, beta_last, em[1:], reverse=True)
    want = np.asarray(jnp.concatenate([head, beta_last[None]], 0))
    got = np.asarray(backward_betas_pallas(em, allow2_dst, beta_last,
                                           interpret=True))
    assert np.allclose(got, want, atol=1e-4), \
        np.abs(got - want).max()


def test_ctc_loss_pallas_impl_end_to_end(monkeypatch):
    """Loss + gradient identical through the env-var switch."""
    lp, labels, ilens, llens, _, _ = _setup(seed=3)

    def f(lp):
        return jnp.sum(ctc_loss(lp, labels, ilens, llens,
                                reduction="none"))

    base_l, base_g = jax.value_and_grad(f)(lp)
    monkeypatch.setenv("CAT_TPU_CTC_IMPL", "pallas")
    pal_l, pal_g = jax.value_and_grad(f)(lp)
    assert np.allclose(float(base_l), float(pal_l), atol=1e-4)
    assert np.allclose(np.asarray(base_g), np.asarray(pal_g), atol=1e-4)
