"""Flash rel-pos attention kernel vs the pure-XLA reference.

Runs in Pallas interpret mode on the CPU backend (no dropout — the
hardware PRNG has no CPU lowering; the dropout path is exercised on TPU
by the bench and by test parity of seeds in ops/dropout_pallas.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ops.attention_pallas import (flash_relpos_attention,
                                          relpos_attention_reference)


def _inputs(N, T, H, Dh, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((N, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, T, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, T, H, Dh)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((2 * T - 1, H, Dh)) * 0.5,
                    jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, Dh)) * 0.1, jnp.float32)
    vb = jnp.asarray(rng.standard_normal((H, Dh)) * 0.1, jnp.float32)
    if ragged:
        lengths = rng.integers(max(1, T // 2), T + 1, size=N)
        lengths[0] = T
    else:
        lengths = np.full(N, T)
    kmask = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    return q, k, v, p, u, vb, kmask


@pytest.mark.parametrize("N,T,H,Dh,block", [
    (2, 50, 2, 32, 128),    # single tile, padded T and Dh
    (2, 200, 2, 64, 128),   # multi-tile online softmax (nq = nk = 2)
    (1, 128, 4, 128, 128),  # exact tile fit
    (2, 300, 2, 64, 256),   # block > needed, Tp = 512... (nq = 2)
])
def test_forward_matches_reference(N, T, H, Dh, block):
    q, k, v, p, u, vb, kmask = _inputs(N, T, H, Dh)
    ref = relpos_attention_reference(q, k, v, p, u, vb, kmask)
    out = flash_relpos_attention(q, k, v, p, u, vb, kmask,
                                 block=block, interpret=True)
    qvalid = np.asarray(kmask)[:, :, None, None]
    np.testing.assert_allclose(np.where(qvalid, np.asarray(out), 0.0),
                               np.where(qvalid, np.asarray(ref), 0.0),
                               rtol=2e-4, atol=2e-5)


def test_grads_match_reference():
    N, T, H, Dh = 2, 200, 2, 64
    q, k, v, p, u, vb, kmask = _inputs(N, T, H, Dh, seed=3)
    # scalar loss that only reads valid query rows (like the layer, which
    # zeroes invalid ones)
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, T, H, Dh)),
        jnp.float32) * kmask[:, :, None, None]

    def loss(fn, args):
        return jnp.sum(fn(*args, kmask) * w)

    args = (q, k, v, p, u, vb)
    g_ref = jax.grad(lambda a: loss(relpos_attention_reference, a))(args)
    g_ker = jax.grad(lambda a: loss(
        lambda *s: flash_relpos_attention(*s, block=128, interpret=True),
        a))(args)
    for gr, gk, name in zip(g_ref, g_ker, "q k v p u vb".split()):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=2e-4, atol=3e-5, err_msg=name)


def test_single_query_block_grads():
    N, T, H, Dh = 1, 60, 2, 32
    q, k, v, p, u, vb, kmask = _inputs(N, T, H, Dh, seed=5)
    w = jnp.asarray(
        np.random.default_rng(2).standard_normal((N, T, H, Dh)),
        jnp.float32) * kmask[:, :, None, None]

    def loss(fn):
        return jnp.sum(fn(q, k, v, p, u, vb, kmask) * w)

    g_ref = jax.grad(lambda qq: loss(
        lambda *a: relpos_attention_reference(*a)))(q)
    # ^ grad wrt q only via closure substitution
    g_ref = jax.grad(lambda qq: jnp.sum(relpos_attention_reference(
        qq, k, v, p, u, vb, kmask) * w))(q)
    g_ker = jax.grad(lambda qq: jnp.sum(flash_relpos_attention(
        qq, k, v, p, u, vb, kmask, block=128, interpret=True) * w))(q)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=2e-4, atol=3e-5)


def test_layer_integration_flash():
    """RelPositionMultiHeadAttention with CAT_TPU_FLASH_ATTN=interpret
    matches the stock XLA path (deterministic, f32)."""
    import os
    from cat_tpu.models.layers import (RelPositionMultiHeadAttention,
                                       length_mask)
    N, T, D, H = 2, 70, 64, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    lengths = jnp.asarray([T, T - 17])
    mask = length_mask(lengths, T)
    mod = RelPositionMultiHeadAttention(num_heads=H, d_model=D)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    ref = mod.apply(params, x, mask)
    os.environ["CAT_TPU_FLASH_ATTN"] = "interpret"
    try:
        out = mod.apply(params, x, mask)
    finally:
        os.environ.pop("CAT_TPU_FLASH_ATTN")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_forward_tiled_path_large_T():
    """T > 512 falls back to the tiled online-softmax kernel — keep it
    covered now that T <= 512 dispatches to the single-tile kernel."""
    N, T, H, Dh = 1, 640, 2, 32
    q, k, v, p, u, vb, kmask = _inputs(N, T, H, Dh, seed=9)
    ref = relpos_attention_reference(q, k, v, p, u, vb, kmask)
    out = flash_relpos_attention(q, k, v, p, u, vb, kmask,
                                 block=128, interpret=True)
    qvalid = np.asarray(kmask)[:, :, None, None]
    np.testing.assert_allclose(np.where(qvalid, np.asarray(out), 0.0),
                               np.where(qvalid, np.asarray(ref), 0.0),
                               rtol=2e-4, atol=3e-5)


# ---- shear-free decomposition kernel (flash_relpos_attention_decomp) ----

from cat_tpu.ops.attention_pallas import flash_relpos_attention_decomp


def _w_inputs(N, T, H, Dh, D, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((N, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, T, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, T, H, Dh)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, H, Dh)) * 0.2, jnp.float32)
    u = jnp.asarray(rng.standard_normal((H, Dh)) * 0.1, jnp.float32)
    vb = jnp.asarray(rng.standard_normal((H, Dh)) * 0.1, jnp.float32)
    lengths = rng.integers(max(1, T // 2), T + 1, size=N)
    lengths[0] = T
    kmask = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    return q, k, v, w, u, vb, kmask


def _p_of_w(w, T):
    from cat_tpu.models.layers import rel_positional_encoding
    pe = rel_positional_encoding(T, w.shape[0])        # (2T-1, D)
    return jnp.einsum("md,dhe->mhe", pe, w)            # (2T-1, H, Dh)


@pytest.mark.parametrize("N,T,H,Dh,D", [
    (2, 50, 2, 32, 64),
    (2, 200, 2, 64, 128),
    (1, 128, 4, 32, 256),
])
def test_decomp_forward_matches_reference(N, T, H, Dh, D):
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D)
    ref = relpos_attention_reference(q, k, v, _p_of_w(w, T), u, vb,
                                     kmask)
    out = flash_relpos_attention_decomp(q, k, v, w, u, vb, kmask,
                                        interpret=True)
    qvalid = np.asarray(kmask)[:, :, None, None]
    np.testing.assert_allclose(np.where(qvalid, np.asarray(out), 0.0),
                               np.where(qvalid, np.asarray(ref), 0.0),
                               rtol=2e-4, atol=2e-4)


def test_decomp_grads_match_reference():
    N, T, H, Dh, D = 2, 200, 2, 64, 128
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=3)
    wt = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, T, H, Dh)),
        jnp.float32) * kmask[:, :, None, None]

    def loss_ref(args):
        q, k, v, w, u, vb = args
        return jnp.sum(relpos_attention_reference(
            q, k, v, _p_of_w(w, T), u, vb, kmask) * wt)

    def loss_ker(args):
        q, k, v, w, u, vb = args
        return jnp.sum(flash_relpos_attention_decomp(
            q, k, v, w, u, vb, kmask, interpret=True) * wt)

    args = (q, k, v, w, u, vb)
    g_ref = jax.grad(loss_ref)(args)
    g_ker = jax.grad(loss_ker)(args)
    for gr, gk, name in zip(g_ref, g_ker, "q k v w u vb".split()):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_layer_integration_decomp():
    """Layer with decomp forced (interpret) matches the stock XLA path."""
    import os
    from cat_tpu.models.layers import (RelPositionMultiHeadAttention,
                                       length_mask)
    N, T, D, H = 2, 70, 64, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    lengths = jnp.asarray([T, T - 17])
    mask = length_mask(lengths, T)
    mod = RelPositionMultiHeadAttention(num_heads=H, d_model=D)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    ref = mod.apply(params, x, mask)
    prior = {k: os.environ.get(k) for k in
             ("CAT_TPU_FLASH_ATTN", "CAT_TPU_FLASH_ATTN_DECOMP")}
    os.environ["CAT_TPU_FLASH_ATTN"] = "interpret"
    os.environ["CAT_TPU_FLASH_ATTN_DECOMP"] = "interpret"
    try:
        out = mod.apply(params, x, mask)
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_decomp_nb_blocked_grads(monkeypatch):
    """NB-batched grid (4 items/step fwd, 2 bwd) matches the reference."""
    monkeypatch.setenv("CAT_TPU_FLASH_NB_FWD", "4")
    monkeypatch.setenv("CAT_TPU_FLASH_NB_BWD", "2")
    N, T, H, Dh, D = 4, 96, 2, 32, 64
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=7)
    wt = jnp.asarray(
        np.random.default_rng(4).standard_normal((N, T, H, Dh)),
        jnp.float32) * kmask[:, :, None, None]

    def loss_ref(args):
        q, k, v, w, u, vb = args
        return jnp.sum(relpos_attention_reference(
            q, k, v, _p_of_w(w, T), u, vb, kmask) * wt)

    def loss_ker(args):
        q, k, v, w, u, vb = args
        return jnp.sum(flash_relpos_attention_decomp(
            q, k, v, w, u, vb, kmask, interpret=True) * wt)

    args = (q, k, v, w, u, vb)
    g_ref = jax.grad(loss_ref)(args)
    g_ker = jax.grad(loss_ker)(args)
    for gr, gk, name in zip(g_ref, g_ker, "q k v w u vb".split()):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


# ---- packed-layout kernel (flash_relpos_attention_packed) ----

from cat_tpu.ops.attention_pallas import flash_relpos_attention_packed


@pytest.mark.parametrize("N,T,H,Dh,D", [
    (2, 50, 2, 32, 64),
    (4, 96, 2, 64, 128),   # NB blocking >1 possible
])
def test_packed_forward_matches_reference(N, T, H, Dh, D):
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D)
    ref = relpos_attention_reference(q, k, v, _p_of_w(w, T), u, vb,
                                     kmask)
    F = H * Dh
    out = flash_relpos_attention_packed(
        q.reshape(N, T, F), k.reshape(N, T, F), v.reshape(N, T, F),
        w, u, vb, kmask, interpret=True)
    out = out.reshape(N, T, H, Dh)
    qvalid = np.asarray(kmask)[:, :, None, None]
    np.testing.assert_allclose(np.where(qvalid, np.asarray(out), 0.0),
                               np.where(qvalid, np.asarray(ref), 0.0),
                               rtol=2e-4, atol=2e-4)


def test_packed_grads_match_reference():
    N, T, H, Dh, D = 2, 64, 2, 32, 64
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=11)
    F = H * Dh
    wt = jnp.asarray(
        np.random.default_rng(6).standard_normal((N, T, H, Dh)),
        jnp.float32) * kmask[:, :, None, None]

    def loss_ref(args):
        q, k, v, w, u, vb = args
        return jnp.sum(relpos_attention_reference(
            q, k, v, _p_of_w(w, T), u, vb, kmask) * wt)

    def loss_ker(args):
        q, k, v, w, u, vb = args
        out = flash_relpos_attention_packed(
            q.reshape(N, T, F), k.reshape(N, T, F),
            v.reshape(N, T, F), w, u, vb, kmask, interpret=True)
        return jnp.sum(out.reshape(N, T, H, Dh) * wt)

    args = (q, k, v, w, u, vb)
    g_ref = jax.grad(loss_ref)(args)
    g_ker = jax.grad(loss_ker)(args)
    for gr, gk, name in zip(g_ref, g_ker, "q k v w u vb".split()):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_layer_integration_packed(monkeypatch):
    """Layer with the packed kernel (interpret) matches the stock XLA
    path, including the padded-T case (T not a multiple of 8)."""
    from cat_tpu.models.layers import (RelPositionMultiHeadAttention,
                                       length_mask)
    N, T, D, H = 2, 70, 64, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    lengths = jnp.asarray([T, T - 17])
    mask = length_mask(lengths, T)
    mod = RelPositionMultiHeadAttention(num_heads=H, d_model=D)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    ref = mod.apply(params, x, mask)
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN", "interpret")
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN_DECOMP", "interpret")
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN_PACKED", "interpret")
    out = mod.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_sharded_matches_single():
    """custom_partitioning: batch-sharded q/k/v over the 8-device CPU
    mesh matches the unsharded result, fwd and grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    N, T, H, Dh, D = 8, 40, 2, 32, 64
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=13)
    F = H * Dh
    wt = jnp.asarray(
        np.random.default_rng(7).standard_normal((N, T, F)),
        jnp.float32)
    qp, kp, vp = (a.reshape(N, T, F) for a in (q, k, v))

    def loss(q, k, v, rest):
        w, u, vb = rest
        out = flash_relpos_attention_packed(
            q, k, v, w, u, vb, kmask, interpret=True)
        return jnp.sum(out * wt)

    rest = (w, u, vb)
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        qp, kp, vp, rest)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qs, ks, vs = (jax.device_put(a, sh) for a in (qp, kp, vp))
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        qs, ks, vs, rest)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_s = jax.tree_util.tree_leaves(g_sh)
    for i, (gr, gk) in enumerate(zip(flat_r, flat_s)):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"leaf{i}")


# ---- band kernel (flash_relpos_attention_band) ----

from cat_tpu.ops.attention_pallas import flash_relpos_attention_band


@pytest.mark.parametrize("N,T,H,Dh,D", [
    (2, 50, 2, 32, 64),     # single chunk (rc = Tp)
    (4, 96, 2, 64, 128),    # rc=32: multiple chunks + NB blocking
    (2, 200, 2, 64, 128),   # partial last chunk
])
def test_band_forward_matches_reference(N, T, H, Dh, D):
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D)
    ref = relpos_attention_reference(q, k, v, _p_of_w(w, T), u, vb,
                                     kmask)
    F = H * Dh
    out = flash_relpos_attention_band(
        q.reshape(N, T, F), k.reshape(N, T, F), v.reshape(N, T, F),
        w, u, vb, kmask, interpret=True)
    out = out.reshape(N, T, H, Dh)
    qvalid = np.asarray(kmask)[:, :, None, None]
    np.testing.assert_allclose(np.where(qvalid, np.asarray(out), 0.0),
                               np.where(qvalid, np.asarray(ref), 0.0),
                               rtol=2e-4, atol=2e-4)


def test_band_grads_match_reference():
    N, T, H, Dh, D = 2, 64, 2, 32, 64
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=11)
    F = H * Dh
    wt = jnp.asarray(
        np.random.default_rng(6).standard_normal((N, T, H, Dh)),
        jnp.float32) * kmask[:, :, None, None]

    def loss_ref(args):
        q, k, v, w, u, vb = args
        return jnp.sum(relpos_attention_reference(
            q, k, v, _p_of_w(w, T), u, vb, kmask) * wt)

    def loss_ker(args):
        q, k, v, w, u, vb = args
        out = flash_relpos_attention_band(
            q.reshape(N, T, F), k.reshape(N, T, F),
            v.reshape(N, T, F), w, u, vb, kmask, interpret=True)
        return jnp.sum(out.reshape(N, T, H, Dh) * wt)

    args = (q, k, v, w, u, vb)
    g_ref = jax.grad(loss_ref)(args)
    g_ker = jax.grad(loss_ker)(args)
    for gr, gk, name in zip(g_ref, g_ker, "q k v w u vb".split()):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_band_matches_packed_kernel():
    """The band and decomp formulations compute the same math — their
    outputs must agree to bf16-class tolerance at a padded-T shape."""
    N, T, H, Dh, D = 2, 70, 4, 32, 128
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=5)
    F = H * Dh
    args = (q.reshape(N, T, F), k.reshape(N, T, F), v.reshape(N, T, F),
            w, u, vb, kmask)
    a = flash_relpos_attention_packed(*args, interpret=True)
    b = flash_relpos_attention_band(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-4, atol=2e-4)


def test_band_layer_integration(monkeypatch):
    from cat_tpu.models.layers import (RelPositionMultiHeadAttention,
                                       length_mask)
    N, T, D, H = 2, 70, 64, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    lengths = jnp.asarray([T, T - 17])
    mask = length_mask(lengths, T)
    mod = RelPositionMultiHeadAttention(num_heads=H, d_model=D)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    ref = mod.apply(params, x, mask)
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN", "interpret")
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN_DECOMP", "interpret")
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN_PACKED", "interpret")
    monkeypatch.setenv("CAT_TPU_FLASH_ATTN_BAND", "interpret")
    out = mod.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_band_sharded_matches_single():
    """custom_partitioning rule for the band kernels: batch-sharded
    q/k/v over the 8-device CPU mesh matches unsharded, fwd + grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    N, T, H, Dh, D = 8, 40, 2, 32, 64
    q, k, v, w, u, vb, kmask = _w_inputs(N, T, H, Dh, D, seed=13)
    F = H * Dh
    wt = jnp.asarray(
        np.random.default_rng(7).standard_normal((N, T, F)),
        jnp.float32)
    qp, kp, vp = (a.reshape(N, T, F) for a in (q, k, v))

    def loss(q, k, v, rest):
        w, u, vb = rest
        out = flash_relpos_attention_band(
            q, k, v, w, u, vb, kmask, interpret=True)
        return jnp.sum(out * wt)

    rest = (w, u, vb)
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        qp, kp, vp, rest)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qs, ks, vs = (jax.device_put(a, sh) for a in (qp, kp, vp))
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        qs, ks, vs, rest)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_s = jax.tree_util.tree_leaves(g_sh)
    for i, (gr, gk) in enumerate(zip(flat_r, flat_s)):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"leaf{i}")
