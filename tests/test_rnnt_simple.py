"""rnnt_loss_simple must agree exactly with the dense rnnt_loss applied
to log_softmax(f + g) — values and gradients."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.rnnt import rnnt_loss
from cat_tpu.ops.rnnt_simple import rnnt_loss_simple


def make(rng, N=3, T=8, U=4, V=6):
    f = rng.standard_normal((N, T, V)).astype(np.float32)
    g = rng.standard_normal((N, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(N, U)).astype(np.int32)
    il = rng.integers(max(2, T // 2), T + 1, size=(N,)).astype(np.int32)
    il[0] = T
    ul = rng.integers(1, U + 1, size=(N,)).astype(np.int32)
    ul[0] = U
    return f, g, labels, il, ul


def dense_from_fg(f, g):
    lat = f[:, :, None, :] + g[:, None, :, :]
    return jax.nn.log_softmax(lat, axis=-1)


def test_simple_matches_dense_value():
    rng = np.random.default_rng(0)
    f, g, labels, il, ul = make(rng)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ul))
    nll_s = jax.jit(lambda f, g: rnnt_loss_simple(
        f, g, *args, reduction="none"))(jnp.asarray(f), jnp.asarray(g))
    nll_d = jax.jit(lambda f, g: rnnt_loss(
        dense_from_fg(f, g), *args, reduction="none"))(
            jnp.asarray(f), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(nll_s), np.asarray(nll_d),
                               rtol=1e-4, atol=1e-3)


def test_simple_matches_dense_grads():
    rng = np.random.default_rng(1)
    f, g, labels, il, ul = make(rng, N=2, T=6, U=3, V=5)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ul))

    gs = jax.jit(jax.grad(lambda f, g: rnnt_loss_simple(
        f, g, *args, reduction="sum"), argnums=(0, 1)))(
            jnp.asarray(f), jnp.asarray(g))
    gd = jax.jit(jax.grad(lambda f, g: rnnt_loss(
        dense_from_fg(f, g), *args, reduction="sum"), argnums=(0, 1)))(
            jnp.asarray(f), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               rtol=1e-3, atol=2e-3)
