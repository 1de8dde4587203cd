"""Fused Pallas dropout: mask semantics, rate, VJP mask consistency."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cat_tpu.ops.dropout_pallas import fused_dropout, key_to_seed


def _seed(i):
    return key_to_seed(jax.random.PRNGKey(i))


def test_values_are_zero_or_scaled():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((37, 50)),
                    jnp.float32)
    rate = 0.3
    y = np.asarray(fused_dropout(x, _seed(1), rate, True))
    xs = np.asarray(x) / (1 - rate)
    assert np.all((y == 0.0) | np.isclose(y, xs, rtol=1e-6))


def test_drop_rate_statistics():
    x = jnp.ones((512, 513), jnp.float32)
    for rate in (0.1, 0.5):
        y = np.asarray(fused_dropout(x, _seed(2), rate, True))
        dropped = float((y == 0).mean())
        assert abs(dropped - rate) < 0.01, (rate, dropped)


def test_seed_determinism_and_variation():
    x = jnp.ones((64, 64), jnp.float32)
    a = np.asarray(fused_dropout(x, _seed(3), 0.4, True))
    b = np.asarray(fused_dropout(x, _seed(3), 0.4, True))
    c = np.asarray(fused_dropout(x, _seed(4), 0.4, True))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_vjp_uses_same_mask():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((33, 70)),
                    jnp.float32)
    rate = 0.25
    y, vjp = jax.vjp(lambda v: fused_dropout(v, _seed(5), rate, True), x)
    g = jnp.ones_like(y)
    (dx,) = vjp(g)
    # grad = mask/(1-rate): nonzero exactly where y is nonzero, value
    # 1/(1-rate) there
    mask = np.asarray(y) != 0
    dx = np.asarray(dx)
    assert np.allclose(dx[mask], 1.0 / (1 - rate), rtol=1e-6)
    assert np.all(dx[~mask] == 0.0)


def test_bfloat16_and_odd_shapes():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 7, 129)),
                    jnp.bfloat16)
    y = fused_dropout(x, _seed(6), 0.2, True)
    assert y.shape == x.shape and y.dtype == x.dtype


def test_model_path_with_fused_dropout(monkeypatch):
    """ConformerCell forward+grad works with the fused dropout wired in."""
    monkeypatch.setenv("CAT_TPU_FUSED_DROPOUT", "interpret")
    from cat_tpu.models.layers import ConformerCell
    cell = ConformerCell(d_model=32, num_heads=4, kernel_size=8,
                         dropout_rate=0.2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 12, 32)),
                    jnp.float32)
    lens = jnp.asarray([12, 9])
    v = cell.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x, lens, True)

    def loss(p):
        out, _ = cell.apply({"params": p,
                             "batch_stats": v["batch_stats"]},
                            x, lens, False,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    assert any(float(jnp.abs(t).sum()) > 0 for t in flat)
