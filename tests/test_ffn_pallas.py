"""Fused conformer FF kernel vs the stock flax module (interpret mode).

Dropout paths (hardware PRNG) are exercised on-device by
tools/device_checks.py; here rate=0.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ops.ffn_pallas import fused_ff_residual, ff_reference


def _params(D, F, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        gamma=jnp.asarray(rng.standard_normal(D) * 0.2 + 1.0,
                          jnp.float32),
        beta=jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.standard_normal((D, F)) / np.sqrt(D),
                       jnp.float32),
        b1=jnp.asarray(rng.standard_normal(F) * 0.05, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((F, D)) / np.sqrt(F),
                       jnp.float32),
        b2=jnp.asarray(rng.standard_normal(D) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("N,T,D,F", [
    (2, 64, 128, 512),
    (1, 37, 128, 256),   # R=37 forces row padding
])
def test_fused_ff_forward(N, T, D, F):
    p = _params(D, F)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    ref = ff_reference(x, p["gamma"], p["beta"], p["w1"], p["b1"],
                       p["w2"], p["b2"], alpha=0.5)
    out = fused_ff_residual(x, p["gamma"], p["beta"], p["w1"], p["b1"],
                            p["w2"], p["b2"], alpha=0.5,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_ff_grads():
    N, T, D, F = 2, 40, 128, 512
    p = _params(D, F, seed=3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    keys = ["gamma", "beta", "w1", "b1", "w2", "b2"]

    def loss(fn, x, args):
        return jnp.sum(fn(x, *args) * wt)

    args = tuple(p[k] for k in keys)
    ref_fn = lambda x, *a: ff_reference(x, *a, alpha=0.5)
    ker_fn = lambda x, *a: fused_ff_residual(x, *a, alpha=0.5,
                                             interpret=True)
    g_ref = jax.grad(lambda x, a: loss(ref_fn, x, a),
                     argnums=(0, 1))(x, args)
    g_ker = jax.grad(lambda x, a: loss(ker_fn, x, a),
                     argnums=(0, 1))(x, args)
    np.testing.assert_allclose(np.asarray(g_ker[0]),
                               np.asarray(g_ref[0]),
                               rtol=3e-4, atol=3e-4, err_msg="dx")
    for name, gr, gk in zip(keys, g_ref[1], g_ker[1]):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_module_integration(monkeypatch):
    """FFModule with fused_ffn=interpret matches the stock path
    (deterministic, f32, residual folded)."""
    from cat_tpu.models.layers import FFModule
    from cat_tpu.utils.flags import reset_flags
    N, T, D = 2, 50, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    mod = FFModule(d_model=D, expansion=4, residual_alpha=0.5)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("CAT_TPU_FUSED_FFN", "interpret")
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # same param tree in both paths
    fused_params = jax.eval_shape(
        lambda: mod.init(jax.random.PRNGKey(0), x))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fused_params))


def test_module_grads_integration(monkeypatch):
    from cat_tpu.models.layers import FFModule
    N, T, D = 2, 30, 128
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    mod = FFModule(d_model=D, expansion=2, residual_alpha=0.5)
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(mod.apply(p, x) * wt)

    g_ref = jax.grad(loss)(params, x)
    monkeypatch.setenv("CAT_TPU_FUSED_FFN", "interpret")
    g_ker = jax.grad(loss)(params, x)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(g_ker)
    for (pr, vr), (pk, vk) in zip(flat_r, flat_k):
        np.testing.assert_allclose(
            np.asarray(vk), np.asarray(vr), rtol=3e-4, atol=3e-4,
            err_msg=jax.tree_util.keystr(pr))


def test_fused_ff_sharded_matches_single():
    """custom_partitioning: row-sharded input over the 8-device CPU
    mesh matches the unsharded result, fwd and grads (weights/grads
    replicated, dW psum'd across shards)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    N, T, D, F = 8, 32, 128, 256
    p = _params(D, F, seed=9)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    keys = ["gamma", "beta", "w1", "b1", "w2", "b2"]
    args = tuple(p[k] for k in keys)

    def loss(x, args):
        return jnp.sum(fused_ff_residual(x, *args, alpha=0.5,
                                         interpret=True) * wt)

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, args)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, args)
    np.testing.assert_allclose(np.asarray(g_sh[0]),
                               np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-4, err_msg="dx")
    for name, gr, gk in zip(keys, g_ref[1], g_sh[1]):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
