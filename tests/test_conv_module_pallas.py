"""Fused conv-module stages vs the stock flax ConvModule (interpret).

Dropout/hardware-PRNG paths are exercised on-device by
tools/device_checks.py; here deterministic or rate=0 only.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.models.layers import ConvModule, length_mask


def _setup(N=2, T=50, D=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    lengths = jnp.asarray(
        [T - (13 * i) % max(1, T // 2) for i in range(N)])
    mask = length_mask(lengths, T)
    mod = ConvModule(d_model=D, kernel_size=8, residual=True)
    vs = mod.init(jax.random.PRNGKey(0), x, mask,
                  deterministic=False)
    return mod, vs, x, mask


def test_fused_conv_module_forward(monkeypatch):
    mod, vs, x, mask = _setup()
    ref, ref_vars = mod.apply(vs, x, mask, deterministic=False,
                              mutable=["batch_stats"])
    monkeypatch.setenv("CAT_TPU_FUSED_CONV_MOD", "interpret")
    out, out_vars = mod.apply(vs, x, mask, deterministic=False,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # running-stat EMA updates identical in both paths
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(out_vars["batch_stats"]["ConvModule_0"][k]
                       if "ConvModule_0" in out_vars["batch_stats"]
                       else out_vars["batch_stats"][k]),
            np.asarray(ref_vars["batch_stats"]["ConvModule_0"][k]
                       if "ConvModule_0" in ref_vars["batch_stats"]
                       else ref_vars["batch_stats"][k]),
            rtol=1e-5, atol=1e-6)
    # same param tree
    assert (jax.tree_util.tree_structure(vs["params"])
            == jax.tree_util.tree_structure(
                jax.eval_shape(lambda: mod.init(
                    jax.random.PRNGKey(0), x, mask,
                    deterministic=False))["params"]))


def test_fused_conv_module_eval_mode(monkeypatch):
    """deterministic=True uses running stats — also fused."""
    mod, vs, x, mask = _setup(seed=2)
    ref = mod.apply(vs, x, mask, deterministic=True)
    monkeypatch.setenv("CAT_TPU_FUSED_CONV_MOD", "interpret")
    out = mod.apply(vs, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_conv_module_grads(monkeypatch):
    mod, vs, x, mask = _setup(T=40, seed=3)
    rng = np.random.default_rng(4)
    wt = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss(params, x):
        out, _ = mod.apply(
            {"params": params,
             "batch_stats": vs["batch_stats"]}, x, mask,
            deterministic=False, mutable=["batch_stats"])
        return jnp.sum(out * wt)

    g_ref = jax.grad(loss, argnums=(0, 1))(vs["params"], x)
    monkeypatch.setenv("CAT_TPU_FUSED_CONV_MOD", "interpret")
    g_ker = jax.grad(loss, argnums=(0, 1))(vs["params"], x)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(g_ker)
    for (pr, vr), (pk, vk) in zip(flat_r, flat_k):
        np.testing.assert_allclose(
            np.asarray(vk), np.asarray(vr), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(pr))


def test_fused_conv_module_sharded(monkeypatch):
    """Fused conv module under a batch-sharded 8-device mesh matches
    the unsharded fused result (custom_partitioning rules)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mod, vs, x, mask = _setup(N=8, T=32, D=128, seed=6)
    monkeypatch.setenv("CAT_TPU_FUSED_CONV_MOD", "interpret")
    rng = np.random.default_rng(3)
    wt = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss(params, x):
        out, _ = mod.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            x, mask, deterministic=False, mutable=["batch_stats"])
        return jnp.sum(out * wt)

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)))(vs["params"], x)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1)))(vs["params"], xs)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_s = jax.tree_util.tree_leaves(g_sh)
    for i, (gr, gk) in enumerate(zip(flat_r, flat_s)):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"leaf{i}")
