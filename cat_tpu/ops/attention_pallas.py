"""Fused flash attention with Transformer-XL relative positions (Pallas).

The conformer's rel-pos MHSA (models/layers.py RelPositionMultiHeadAttention,
role reference /root/reference/cat/shared/layer.py:238-416) materializes four
(N, H, T, ~T)-sized tensors per cell in XLA-land: the content scores `ac`
(f32), the position table `bd` (bf16, width 2T-1), the masked scores, and the
softmax probs. At the flagship bench shape (batch 96, T=400 post-subsample)
that is ~1.7 GB of pure HBM traffic per cell, recomputed again under remat in
the backward pass — and the encoder is ~100% of the training step (STATUS.md).

This kernel computes the whole attention — content scores, rel-pos scores,
masking, online softmax, post-softmax dropout, and the value contraction — in
VMEM tiles, so nothing T×T-sized ever touches HBM.

Design notes (the non-standard parts relative to a stock flash attention):

* Rel-pos scores. bd[t, s] = (q_t + v_bias) · p[T-1-t+s], where p is the
  projected sinusoid table of relative distances. For square tiles of size b
  with q-block i and k-block j, the needed window of p is
  p[m0 : m0+2b), m0 = b·(T/b - 1 + j - i) — *block aligned*. The kernel loads
  the window as two b-row blocks (index maps `widx`, `widx+1`), computes
  qp = (q+v_bias) @ p_winᵀ (b, 2b), and extracts the diagonal-band layout
  bd[t', s'] = qp[t', b-1-t'+s'] with a *shear*: log2(b) conditional lane
  rotations (`pltpu.roll`), rows with bit k of t' set rolled by 2^k. No
  gathers, no cross-lane reshape.

* Dropout. Applied to the (unnormalized) softmax numerator inside the online
  accumulation with the core hardware PRNG, seeded per grid tile; backward
  re-seeds identically, so no mask is ever stored (same contract as
  ops/dropout_pallas.py).

* Backward. One kernel, grid (H, N, i, j): d{qu,qv} accumulate over the
  innermost j into their (revisit-contiguous) output blocks; dk/dv accumulate
  into full-T output blocks per (h, n); dp accumulates into a VMEM scratch of
  the full (2T, Dh) table per head (it is tiny) and flushes at the last tile
  of each head. The inverse shear places d(bd) back into qp coordinates.

The softmax statistics (logsumexp) are saved from the forward pass, so the
backward recomputes probs in one pass — the standard flash trick.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
# raise the scoped-VMEM cap past the 16 MB compiler default (empirically
# fine on this part; lets larger NB blocks and deeper pipelining
# compile). Env-overridable for block-size experiments (v5e has 128 MB
# physical VMEM; the 64 MB default leaves room for double-buffering).
import os as _os
# round-5: 96 MB default — NB=8 blocks for both kernel directions need
# ~82 MB scoped and measure 3112 → 3181 audio-s/s at the flagship
# (the earlier 64 MB cap was the only thing forcing NB=4)
VMEM_LIMIT = int(_os.environ.get("CAT_TPU_ATTN_VMEM",
                                 str(96 * 1024 * 1024)))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shear_right(x, b):
    """(b, 2b) → (b, 2b) with out[t, m] = x[t, m - t (mod 2b)]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < b:
        x = jnp.where((rows & shift) != 0,
                      pltpu.roll(x, shift, axis=1), x)
        shift *= 2
    return x


def _shear_left(x, b):
    """Inverse of _shear_right: out[t, m] = x[t, m + t (mod 2b)]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    W = x.shape[1]
    shift = 1
    while shift < b:
        # left-roll by `shift` == circular right-roll by W - shift
        x = jnp.where((rows & shift) != 0,
                      pltpu.roll(x, W - shift, axis=1), x)
        shift *= 2
    return x


def _band(qp, b):
    """qp (b, 2b) → bd (b, b): bd[t, s] = qp[t, b-1-t+s]."""
    sheared = _shear_right(qp, b)  # sheared[t, m] = qp[t, m - t]
    return sheared[:, b - 1:2 * b - 1]


def _band_t(dbd, b):
    """Transpose-adjoint of _band: dbd (b, b) → dqp (b, 2b) with
    dqp[t, b-1-t+s] = dbd[t, s] (zeros elsewhere)."""
    padded = jnp.pad(dbd, ((0, 0), (b - 1, 1)))
    return _shear_left(padded, b)


def _tile_seed(seed_ref, n, h, i, j, H, nq, nk):
    return seed_ref[1] + ((n * H + h) * nq + i) * nk + j


def _dropout_keep(shape, threshold):
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.int32)
    return (bits ^ jnp.int32(-2147483648)) >= jnp.int32(threshold)


def _thr(rate):
    return min(int(rate * 4294967296.0), 4294967295) - 2147483648


def _fwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p1_ref, p2_ref,
                kb_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, scale, rate, H, nq, nk, b):
    n, h, i, j = (pl.program_id(0), pl.program_id(1),
                  pl.program_id(2), pl.program_id(3))

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    qu = qu_ref[0, 0]           # (b, Dh)
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    pw = jnp.concatenate([p1_ref[0], p2_ref[0]], axis=0)  # (2b, Dh)

    s = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qp = jax.lax.dot_general(qv, pw, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + _band(qp, b)) * scale + kb_ref[0, 0][None, :]

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    m_ref[...] = m_new
    e = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[...] = l_ref[...] * corr + jnp.sum(e, axis=1, keepdims=True)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0],
                        _tile_seed(seed_ref, n, h, i, j, H, nq, nk))
        keep = _dropout_keep(e.shape, _thr(rate))
        e_acc = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
    else:
        e_acc = e
    acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
        e_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _flush():
        l = l_ref[...]
        o_ref[0, 0] = (acc_ref[...]
                       / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[...] = jnp.reshape(
            m_ref[...] + jnp.log(jnp.maximum(l, 1e-30)), (1, 1, 1, b))


def _bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p1_ref, p2_ref,
                kb_ref, lse_ref, do_ref, dd_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref, dps_ref,
                *, scale, rate, H, nq, nk, b):
    h, n, i, j = (pl.program_id(0), pl.program_id(1),
                  pl.program_id(2), pl.program_id(3))

    @pl.when(j == 0)
    def _init_q():
        dqu_ref[...] = jnp.zeros_like(dqu_ref)
        dqv_ref[...] = jnp.zeros_like(dqv_ref)

    @pl.when((i == 0) & (j == 0))
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _init_p():
        dps_ref[...] = jnp.zeros_like(dps_ref)

    qu = qu_ref[0, 0]
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    pw = jnp.concatenate([p1_ref[0], p2_ref[0]], axis=0)  # (2b, Dh)

    s = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qp = jax.lax.dot_general(qv, pw, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + _band(qp, b)) * scale + kb_ref[0, 0][None, :]
    p_ = jnp.exp(s - lse_ref[0, 0, 0][:, None])        # true probs (b, b)

    dpmat = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0],
                        _tile_seed(seed_ref, n, h, i, j, H, nq, nk))
        keep = _dropout_keep(p_.shape, _thr(rate))
        inv = 1.0 / (1.0 - rate)
        p_drop = jnp.where(keep, p_ * inv, 0.0)
        dpmat = jnp.where(keep, dpmat * inv, 0.0)
    else:
        p_drop = p_
    # dv += P_dropᵀ @ dO
    dv_ref[0, 0, pl.ds(j * b, b), :] += jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p_ * (dpmat - dd_ref[0, 0, 0][:, None]) * scale   # (b, b) f32
    dsl = ds.astype(k.dtype)
    dqu_ref[...] += jax.lax.dot_general(
        dsl, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None, None]
    dk_ref[0, 0, pl.ds(j * b, b), :] += jax.lax.dot_general(
        dsl, qu, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqp = _band_t(ds, b).astype(pw.dtype)                # (b, 2b)
    dqv_ref[...] += jax.lax.dot_general(
        dqp, pw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None, None]
    # dp window accumulate: rows [widx·b, widx·b + 2b) of the (2T, Dh) table
    widx = nq - 1 + j - i
    dpw = jax.lax.dot_general(dqp, qv, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dps_ref[pl.ds(widx * b, 2 * b), :] += dpw

    @pl.when((n == pl.num_programs(1) - 1) & (i == nq - 1) & (j == nk - 1))
    def _flush_p():
        dp_ref[0] = dps_ref[...]


def _fwd_kernel_single(seed_ref, q_ref, k_ref, v_ref, p_ref, kb_ref,
                       ub_ref, vb_ref, o_ref, lse_ref, *, scale, rate,
                       H, b):
    """Whole-sequence tile: one (n, h) per grid step (T ≤ b).

    Removes the tiled kernel's overheads at ASR shapes: no online-
    softmax corrections, no Dh padding to 128, no duplicated q+u / q+v
    input streams (biases are added in-kernel), ~8× fewer grid tiles.
    """
    n, h = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0]                 # (b, Dh)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    pw = p_ref[0]                   # (2b, Dh)
    ub = ub_ref[0].astype(q.dtype)  # (1, Dh)
    vb = vb_ref[0].astype(q.dtype)

    s = jax.lax.dot_general(q + ub, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # NOTE: the (b, 2b) shear must stay f32 — this Mosaic version's
    # lane-roll crashes the remote compiler on bf16 operands (tried:
    # ~33% of kernel time is the shear; revisit when Mosaic allows it)
    qp = jax.lax.dot_general(q + vb, pw, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + _band(qp, b)) * scale + kb_ref[0, 0][None, :]
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0],
                        _tile_seed(seed_ref, n, h, 0, 0, H, 1, 1))
        keep = _dropout_keep(e.shape, _thr(rate))
        e = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
    acc = jax.lax.dot_general(e.astype(v.dtype), v,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[...] = jnp.reshape(m + jnp.log(jnp.maximum(l, 1e-30)),
                               (1, 1, 1, b))


def _bwd_kernel_single(seed_ref, q_ref, k_ref, v_ref, p_ref, kb_ref,
                       ub_ref, vb_ref, lse_ref, do_ref, dd_ref,
                       dq_ref, dk_ref, dv_ref, dp_ref, dub_ref, dvb_ref,
                       dps_ref, dubs_ref, dvbs_ref,
                       *, scale, rate, H, b):
    h, n = pl.program_id(0), pl.program_id(1)

    @pl.when(n == 0)
    def _init_p():
        dps_ref[...] = jnp.zeros_like(dps_ref)
        dubs_ref[...] = jnp.zeros_like(dubs_ref)
        dvbs_ref[...] = jnp.zeros_like(dvbs_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    pw = p_ref[0]
    ub = ub_ref[0].astype(q.dtype)
    vb = vb_ref[0].astype(q.dtype)
    qu = q + ub
    qv = q + vb

    s = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qp = jax.lax.dot_general(qv, pw, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + _band(qp, b)) * scale + kb_ref[0, 0][None, :]
    p_ = jnp.exp(s - lse_ref[0, 0, 0][:, None])          # (b, b)

    dpmat = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0],
                        _tile_seed(seed_ref, n, h, 0, 0, H, 1, 1))
        keep = _dropout_keep(p_.shape, _thr(rate))
        inv = 1.0 / (1.0 - rate)
        p_drop = jnp.where(keep, p_ * inv, 0.0)
        dpmat = jnp.where(keep, dpmat * inv, 0.0)
    else:
        p_drop = p_
    dv_ref[0, 0] = jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    ds = p_ * (dpmat - dd_ref[0, 0, 0][:, None]) * scale
    dsl = ds.astype(k.dtype)
    dqu = jax.lax.dot_general(dsl, k, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dk_ref[0, 0] = jax.lax.dot_general(
        dsl, qu, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dqp = _band_t(ds, b).astype(pw.dtype)                # (b, 2b)
    dqv = jax.lax.dot_general(dqp, pw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dq_ref[0, 0] = (dqu + dqv).astype(dq_ref.dtype)
    dps_ref[...] += jax.lax.dot_general(
        dqp, qv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dubs_ref[...] += jnp.sum(dqu, axis=0, keepdims=True)
    dvbs_ref[...] += jnp.sum(dqv, axis=0, keepdims=True)

    @pl.when(n == pl.num_programs(1) - 1)
    def _flush():
        dp_ref[0] = dps_ref[...]
        dub_ref[...] = dubs_ref[...].reshape(dub_ref.shape)
        dvb_ref[...] = dvbs_ref[...].reshape(dvb_ref.shape)


def _decomp_tables(Tp, D):
    """Trig tables for the shear-free rel-pos decomposition.

    With the standard sinusoid basis pe(d)[2f] = sin(w_f d),
    pe(d)[2f+1] = cos(w_f d) (w_f = 10000^(-2f/D)) and the projected
    table p[m] = pe(t-s) @ W, the rel-pos scores factorize by the angle
    addition formulas:

        bd[t, s] = r(t) . pe(t-s) = U(t) . V(s),   r(t) = qv_t @ W^T

    where U[t] is an elementwise combination of r(t) with sin/cos(w t)
    and V[s] = [cos(w_f s), sin(w_f s)]. This replaces the kernel's
    diagonal-band shear (log2(b) masked lane rolls of a (b, 2b) f32
    tile — ~33% of kernel time) with one MXU matmul and two single-lane
    rolls. Returns (A, B, C, V) with
        U = r*A + rollL(r)*B + rollR(r)*C
    (rollL[m] = r[m+1], rollR[m] = r[m-1]; the circular wrap hits only
    zero entries of B/C)."""
    t = np.arange(Tp)[:, None].astype(np.float64)
    w = np.exp(np.arange(0, D, 2) * (-np.log(10000.0) / D))
    sin_t, cos_t = np.sin(t * w), np.cos(t * w)  # (Tp, D/2)
    A = np.zeros((Tp, D), np.float32)
    B = np.zeros((Tp, D), np.float32)
    C = np.zeros((Tp, D), np.float32)
    V = np.zeros((Tp, D), np.float32)
    A[:, 0::2] = sin_t
    A[:, 1::2] = sin_t
    B[:, 0::2] = cos_t            # U[2f] += r[2f+1] * cos
    C[:, 1::2] = -cos_t           # U[2f+1] += r[2f] * (-cos)
    V[:, 0::2] = cos_t
    V[:, 1::2] = sin_t
    return A, B, C, V


def _build_u(r, a, b, c, D):
    ax = r.ndim - 1
    rollL = pltpu.roll(r, D - 1, axis=ax)  # rollL[m] = r[m+1]
    rollR = pltpu.roll(r, 1, axis=ax)      # rollR[m] = r[m-1]
    return r * a + rollL * b + rollR * c


def _load_tables_once(first, srcs, dsts, sem):
    """DMA the grid-invariant trig tables HBM→VMEM scratch on the first
    grid step only. Declaring them as ordinary VMEM inputs re-fetches
    ~1.7 MB per grid step (measured: +2.4 ms/call at the flagship shape
    — the tables were most of the kernel's runtime)."""

    @pl.when(first)
    def _():
        for i, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(src, dst, sem.at[i]).start()
        for i, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(src, dst, sem.at[i]).wait()


def _fwd_kernel_decomp(seed_ref, q_ref, k_ref, v_ref, w_ref, a_ref,
                       b_ref, c_ref, vt_ref, kb_ref, ub_ref, vb_ref,
                       o_ref, lse_ref, atab, btab, ctab, vtab, sem,
                       *, scale, rate, H, b, D, NB):
    """Whole-sequence tiles, shear-free rel-pos (see _decomp_tables).

    Processes NB batch items per grid step: amortizes the per-step
    dispatch/DMA-setup overhead (the round-3 trace showed the kernel at
    ~20% efficiency across 1024 tiny (n, h) steps) and flattens the
    dominant bd matmul to (NB·b, D) @ (D, b) — a deep-M MXU call
    instead of NB shallow ones. The trig tables live in VMEM scratch,
    DMA'd once (see _load_tables_once)."""
    h, nb = pl.program_id(0), pl.program_id(1)
    _load_tables_once((h == 0) & (nb == 0),
                      (a_ref, b_ref, c_ref, vt_ref),
                      (atab, btab, ctab, vtab), sem)
    q = q_ref[:, 0]                 # (NB, b, Dh)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    w = w_ref[0]                    # (Dh, D)
    ub = ub_ref[0].astype(q.dtype)  # (1, Dh)
    vb = vb_ref[0].astype(q.dtype)
    Dh = q.shape[-1]

    batched = (((2,), (2,)), ((0,), (0,)))
    s = jax.lax.dot_general(q + ub, k, batched,
                            preferred_element_type=jnp.float32)
    qv2 = (q + vb).reshape(NB * b, Dh)
    r = jax.lax.dot_general(qv2, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = _build_u(r.reshape(NB, b, D),
                 atab[...].astype(jnp.float32),
                 btab[...].astype(jnp.float32),
                 ctab[...].astype(jnp.float32), D)
    bd = jax.lax.dot_general(u.reshape(NB * b, D).astype(vtab.dtype),
                             vtab[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + bd.reshape(NB, b, b)) * scale + kb_ref[:, 0][:, None, :]
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=2, keepdims=True)
    if rate > 0.0:
        # per-ITEM seeds (n = nb·NB + i), so the mask is independent of
        # the block size — fwd and bwd may pick different NB
        keeps = []
        for i in range(NB):
            pltpu.prng_seed(seed_ref[0],
                            _tile_seed(seed_ref, nb * NB + i, h,
                                       0, 0, H, 1, 1))
            keeps.append(_dropout_keep((b, b), _thr(rate)))
        keep = jnp.stack(keeps)
        e = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
    acc = jax.lax.dot_general(e.astype(v.dtype), v,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[:, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:, 0, 0] = jnp.reshape(
        m + jnp.log(jnp.maximum(l, 1e-30)), (NB, b))


def _bwd_kernel_decomp(seed_ref, q_ref, k_ref, v_ref, w_ref, a_ref,
                       b_ref, c_ref, vt_ref, kb_ref, ub_ref, vb_ref,
                       lse_ref, do_ref, dd_ref,
                       dq_ref, dk_ref, dv_ref, dw_ref, dub_ref, dvb_ref,
                       dws_ref, dubs_ref, dvbs_ref,
                       atab, btab, ctab, vtab, sem,
                       *, scale, rate, H, b, D, NB):
    h, nb = pl.program_id(0), pl.program_id(1)
    _load_tables_once((h == 0) & (nb == 0),
                      (a_ref, b_ref, c_ref, vt_ref),
                      (atab, btab, ctab, vtab), sem)

    @pl.when(nb == 0)
    def _init_p():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dubs_ref[...] = jnp.zeros_like(dubs_ref)
        dvbs_ref[...] = jnp.zeros_like(dvbs_ref)

    q = q_ref[:, 0]                 # (NB, b, Dh)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    do = do_ref[:, 0]
    w = w_ref[0]
    ub = ub_ref[0].astype(q.dtype)
    vb = vb_ref[0].astype(q.dtype)
    qu = q + ub
    qv = q + vb
    Dh = q.shape[-1]

    a = atab[...].astype(jnp.float32)
    b_t = btab[...].astype(jnp.float32)
    c = ctab[...].astype(jnp.float32)
    batched = (((2,), (2,)), ((0,), (0,)))
    s = jax.lax.dot_general(qu, k, batched,
                            preferred_element_type=jnp.float32)
    qv2 = qv.reshape(NB * b, Dh)
    r = jax.lax.dot_general(qv2, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = _build_u(r.reshape(NB, b, D), a, b_t, c, D)
    bd = jax.lax.dot_general(u.reshape(NB * b, D).astype(vtab.dtype),
                             vtab[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (s + bd.reshape(NB, b, b)) * scale + kb_ref[:, 0][:, None, :]
    p_ = jnp.exp(s - lse_ref[:, 0, 0][:, :, None])       # (NB, b, b)

    dpmat = jax.lax.dot_general(do, v, batched,
                                preferred_element_type=jnp.float32)
    if rate > 0.0:
        keeps = []
        for i in range(NB):
            pltpu.prng_seed(seed_ref[0],
                            _tile_seed(seed_ref, nb * NB + i, h,
                                       0, 0, H, 1, 1))
            keeps.append(_dropout_keep((b, b), _thr(rate)))
        keep = jnp.stack(keeps)
        inv = 1.0 / (1.0 - rate)
        p_drop = jnp.where(keep, p_ * inv, 0.0)
        dpmat = jnp.where(keep, dpmat * inv, 0.0)
    else:
        p_drop = p_
    dv_ref[:, 0] = jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    ds = p_ * (dpmat - dd_ref[:, 0, 0][:, :, None]) * scale
    dsl = ds.astype(k.dtype)
    dqu = jax.lax.dot_general(dsl, k, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dk_ref[:, 0] = jax.lax.dot_general(
        dsl, qu, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    # bd path: dU = ds @ V; dr = adjoint of _build_u; dqv = dr @ w^T
    du = jax.lax.dot_general(dsl.reshape(NB * b, b), vtab[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    du = du.reshape(NB, b, D)
    dr = (du * a
          + pltpu.roll(du * b_t, 1, axis=2)        # dr[m+1] += du[m]*B[m]
          + pltpu.roll(du * c, D - 1, axis=2))     # dr[m-1] += du[m]*C[m]
    dr2 = dr.reshape(NB * b, D)
    drl = dr2.astype(w.dtype)
    dqv = jax.lax.dot_general(drl, w, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dqv = dqv.reshape(NB, b, Dh)
    dq_ref[:, 0] = (dqu + dqv).astype(dq_ref.dtype)
    dws_ref[...] += jax.lax.dot_general(
        qv2.astype(jnp.float32), dr2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dubs_ref[...] += jnp.sum(dqu, axis=(0, 1), keepdims=False)[None]
    dvbs_ref[...] += jnp.sum(dqv, axis=(0, 1), keepdims=False)[None]

    @pl.when(nb == pl.num_programs(1) - 1)
    def _flush():
        dw_ref[0] = dws_ref[...]
        dub_ref[...] = dubs_ref[...].reshape(dub_ref.shape)
        dvb_ref[...] = dvbs_ref[...].reshape(dvb_ref.shape)


def _fwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, w_ref, a_ref,
                       b_ref, c_ref, vt_ref, kb_ref, ub_ref, vb_ref,
                       o_ref, lse_ref, ws, atab, btab, ctab, vtab, sem,
                       *, scale, rate, H, b, D, Dh, NB):
    """Packed-layout decomp attention: q/k/v/o are (NB, b, H·Dh) blocks
    straight from the projection outputs — no (N,T,H,Dh)→(N,H,T,Dh)
    transpose or relayout ever happens in XLA-land (those pad+transpose
    fusions measured ~36 ms/step at the flagship shape). Heads are an
    in-kernel loop over 64-lane slices."""
    nb = pl.program_id(0)
    _load_tables_once(nb == 0,
                      (a_ref, b_ref, c_ref, vt_ref, w_ref),
                      (atab, btab, ctab, vtab, ws), sem)
    q = q_ref[...]                  # (NB, b, F)
    k = k_ref[...]
    v = v_ref[...]
    ub = ub_ref[...].astype(q.dtype)  # (1, F)
    vb = vb_ref[...].astype(q.dtype)
    kb = kb_ref[:, 0][:, None, :]     # (NB, 1, b)
    a = atab[...].astype(jnp.float32)
    b_t = btab[...].astype(jnp.float32)
    c = ctab[...].astype(jnp.float32)
    batched = (((2,), (2,)), ((0,), (0,)))
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        w = ws[h]                   # (Dh, D)
        s = jax.lax.dot_general(qh + ub[:, sl][None], kh, batched,
                                preferred_element_type=jnp.float32)
        qv2 = (qh + vb[:, sl][None]).reshape(NB * b, Dh)
        r = jax.lax.dot_general(qv2, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = _build_u(r.reshape(NB, b, D), a, b_t, c, D)
        bd = jax.lax.dot_general(
            u.reshape(NB * b, D).astype(vtab.dtype), vtab[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = (s + bd.reshape(NB, b, b)) * scale + kb
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=2, keepdims=True)
        if rate > 0.0:
            keeps = []
            for i in range(NB):
                pltpu.prng_seed(seed_ref[0],
                                _tile_seed(seed_ref, nb * NB + i, h,
                                           0, 0, H, 1, 1))
                keeps.append(_dropout_keep((b, b), _thr(rate)))
            keep = jnp.stack(keeps)
            e = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
        acc = jax.lax.dot_general(e.astype(vh.dtype), vh,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = (acc / jnp.maximum(l, 1e-30)).astype(
            o_ref.dtype)
        lse_ref[:, h, :] = jnp.reshape(
            m + jnp.log(jnp.maximum(l, 1e-30)), (NB, b))


def _bwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, w_ref, a_ref,
                       b_ref, c_ref, vt_ref, kb_ref, ub_ref, vb_ref,
                       lse_ref, do_ref, dd_ref,
                       dq_ref, dk_ref, dv_ref, dw_ref, dub_ref,
                       dvb_ref,
                       ws, atab, btab, ctab, vtab, dws, dubs, dvbs,
                       sem,
                       *, scale, rate, H, b, D, Dh, NB):
    nb = pl.program_id(0)
    _load_tables_once(nb == 0,
                      (a_ref, b_ref, c_ref, vt_ref, w_ref),
                      (atab, btab, ctab, vtab, ws), sem)

    @pl.when(nb == 0)
    def _init_p():
        dws[...] = jnp.zeros_like(dws)
        dubs[...] = jnp.zeros_like(dubs)
        dvbs[...] = jnp.zeros_like(dvbs)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    ub = ub_ref[...].astype(q.dtype)
    vb = vb_ref[...].astype(q.dtype)
    kb = kb_ref[:, 0][:, None, :]
    a = atab[...].astype(jnp.float32)
    b_t = btab[...].astype(jnp.float32)
    c = ctab[...].astype(jnp.float32)
    batched = (((2,), (2,)), ((0,), (0,)))
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        doh = do[:, :, sl]
        w = ws[h]
        qu = qh + ub[:, sl][None]
        qv = qh + vb[:, sl][None]
        s = jax.lax.dot_general(qu, kh, batched,
                                preferred_element_type=jnp.float32)
        qv2 = qv.reshape(NB * b, Dh)
        r = jax.lax.dot_general(qv2, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = _build_u(r.reshape(NB, b, D), a, b_t, c, D)
        bd = jax.lax.dot_general(
            u.reshape(NB * b, D).astype(vtab.dtype), vtab[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = (s + bd.reshape(NB, b, b)) * scale + kb
        p_ = jnp.exp(s - lse_ref[:, h, :][:, :, None])   # (NB, b, b)

        dpmat = jax.lax.dot_general(doh, vh, batched,
                                    preferred_element_type=jnp.float32)
        if rate > 0.0:
            keeps = []
            for i in range(NB):
                pltpu.prng_seed(seed_ref[0],
                                _tile_seed(seed_ref, nb * NB + i, h,
                                           0, 0, H, 1, 1))
                keeps.append(_dropout_keep((b, b), _thr(rate)))
            keep = jnp.stack(keeps)
            inv = 1.0 / (1.0 - rate)
            p_drop = jnp.where(keep, p_ * inv, 0.0)
            dpmat = jnp.where(keep, dpmat * inv, 0.0)
        else:
            p_drop = p_
        dv_ref[:, :, sl] = jax.lax.dot_general(
            p_drop.astype(doh.dtype), doh,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        ds = p_ * (dpmat - dd_ref[:, h, :][:, :, None]) * scale
        dsl = ds.astype(kh.dtype)
        dqu = jax.lax.dot_general(dsl, kh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dk_ref[:, :, sl] = jax.lax.dot_general(
            dsl, qu, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        du = jax.lax.dot_general(dsl.reshape(NB * b, b), vtab[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        du = du.reshape(NB, b, D)
        dr = (du * a
              + pltpu.roll(du * b_t, 1, axis=2)
              + pltpu.roll(du * c, D - 1, axis=2))
        dr2 = dr.reshape(NB * b, D)
        drl = dr2.astype(w.dtype)
        dqv = jax.lax.dot_general(drl, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqv = dqv.reshape(NB, b, Dh)
        dq_ref[:, :, sl] = (dqu + dqv).astype(dq_ref.dtype)
        dws[h] += jax.lax.dot_general(
            qv2.astype(jnp.float32), dr2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dubs[:, sl] += jnp.sum(dqu, axis=(0, 1))[None]
        dvbs[:, sl] += jnp.sum(dqv, axis=(0, 1))[None]

    @pl.when(nb == pl.num_programs(0) - 1)
    def _flush():
        dw_ref[...] = dws[...]
        dub_ref[...] = dubs[...]
        dvb_ref[...] = dvbs[...]


def _pallas_fwd_packed(q, k, v, w, tabs, kbias, ub, vb, seed, scale,
                       rate, interpret):
    N, Tp, F = q.shape
    H, Dh, D = w.shape
    a, b_t, c, vt = tabs
    NB = _pick_nb_packed(N, Tp, F, D)
    kernel = functools.partial(_fwd_kernel_packed, scale=scale,
                               rate=rate, H=H, b=Tp, D=D, Dh=Dh, NB=NB)
    o, lse = pl.pallas_call(
        kernel,
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NB, 1, Tp), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, H, Tp), lambda nb: (nb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((N, H, Tp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((H, Dh, D), w.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, w, a, b_t, c, vt, kbias, ub, vb)
    return o, lse


def _pallas_bwd_packed(q, k, v, w, tabs, kbias, ub, vb, seed, lse, do,
                       dd, scale, rate, interpret):
    N, Tp, F = q.shape
    H, Dh, D = w.shape
    a, b_t, c, vt = tabs
    NB = _pick_nb_packed(N, Tp, F, D, bwd=True)
    kernel = functools.partial(_bwd_kernel_packed, scale=scale,
                               rate=rate, H=H, b=Tp, D=D, Dh=Dh, NB=NB)
    f32 = jnp.float32
    dq, dk, dv, dw, dub, dvb = pl.pallas_call(
        kernel,
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NB, 1, Tp), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((NB, H, Tp), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, H, Tp), lambda nb: (nb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((H, Dh, D), lambda nb: (0, 0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((H, Dh, D), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
        ],
        scratch_shapes=[pltpu.VMEM((H, Dh, D), w.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((H, Dh, D), f32),
                        pltpu.VMEM((1, F), f32),
                        pltpu.VMEM((1, F), f32),
                        pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, w, a, b_t, c, vt, kbias, ub, vb, lse, do, dd)
    return dq, dk, dv, dw, dub, dvb


def _pick_nb_packed(N, Tp, F, D, bwd=False):
    import os
    key = "CAT_TPU_FLASH_NB_BWD" if bwd else "CAT_TPU_FLASH_NB_FWD"
    v = os.environ.get(key)
    if v:
        nb = max(1, int(v))
        while N % nb:
            nb //= 2
        return max(1, nb)
    # per-item f32 live set ~ (b,b)·(2 or 4) + (b,D)·(1.5 or 2.5),
    # plus the packed q/k/v/o (do/dq/dk/dv in bwd) bf16 block tiles.
    # Budget scales with the scoped-VMEM cap: at the round-5 default
    # (96 MB) both directions pick NB=8 at the flagship shape —
    # measured 3112 → 3181 audio-s/s (the old 64 MB cap forced NB=4;
    # raising the cap was the whole win)
    per = ((4 * Tp * Tp + 2.5 * Tp * D if bwd
            else 2 * Tp * Tp + 1.5 * Tp * D) * 4
           + (8 if bwd else 4) * Tp * F * 2)
    budget = VMEM_LIMIT // 2 + 8 * 2 ** 20
    nb = 8
    while nb > 1 and (N % nb or nb * per > budget):
        nb //= 2
    return nb


def _fwd_packed_flat(q, k, v, w, a, b_t, c, vt, kbias, ub, vb, seed,
                     scale, rate, interpret):
    return _pallas_fwd_packed(q, k, v, w, (a, b_t, c, vt), kbias, ub,
                              vb, seed, scale, rate, interpret)


def _bwd_packed_flat(q, k, v, w, a, b_t, c, vt, kbias, ub, vb, seed,
                     lse, do, dd, scale, rate, interpret):
    return _pallas_bwd_packed(q, k, v, w, (a, b_t, c, vt), kbias, ub,
                              vb, seed, lse, do, dd, scale, rate,
                              interpret)


from cat_tpu.ops.partitioning import (make_row_partitioned,
                                      use_partitioned)

# multi-chip: batch dim sharded, weights/tables replicated, dw/dub/dvb
# partial-sums psum'd — keeps the fused path on under a data mesh
_fwd_packed_part = make_row_partitioned(
    _fwd_packed_flat, static_argnums=(12, 13, 14),
    row_args=(0, 1, 2, 8), seed_arg=11,
    out_specs=("row", "row"),
    rule="n t f, n t f, n t f, h dh dp, t1 d1, t2 d2, t3 d3, t4 d4, "
         "n k1 kt, u1 uf, v1 vf, sd -> n t f, n h2 t5")
_bwd_packed_part = make_row_partitioned(
    _bwd_packed_flat, static_argnums=(15, 16, 17),
    row_args=(0, 1, 2, 8, 12, 13, 14), seed_arg=11,
    out_specs=("row", "row", "row", "psum", "psum", "psum"),
    rule="n t f, n t f, n t f, h dh dp, t1 d1, t2 d2, t3 d3, t4 d4, "
         "n k1 kt, u1 uf, v1 vf, sd, n h2 t5, n t f, n h3 t6 "
         "-> n t f, n t f, n t f, oh odh odp, ou1 ouf, ov1 ovf")


def _fwd_packed_dispatch(q, k, v, w, tabs, kbias, ub, vb, seed, scale,
                         rate, interpret):
    if use_partitioned():
        return _fwd_packed_part(q, k, v, w, *tabs, kbias, ub, vb,
                                seed, scale, rate, interpret)
    return _pallas_fwd_packed(q, k, v, w, tabs, kbias, ub, vb, seed,
                              scale, rate, interpret)


def _bwd_packed_dispatch(q, k, v, w, tabs, kbias, ub, vb, seed, lse,
                         do, dd, scale, rate, interpret):
    if use_partitioned():
        return _bwd_packed_part(q, k, v, w, *tabs, kbias, ub, vb,
                                seed, lse, do, dd, scale, rate,
                                interpret)
    return _pallas_bwd_packed(q, k, v, w, tabs, kbias, ub, vb, seed,
                              lse, do, dd, scale, rate, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _flash_core_packed(q, k, v, w, tabs, kbias, ub, vb, seed, scale,
                       rate, interpret):
    o, _ = _fwd_packed_dispatch(q, k, v, w, tabs, kbias, ub, vb, seed,
                                scale, rate, interpret)
    return o


def _flash_core_packed_fwd(q, k, v, w, tabs, kbias, ub, vb, seed,
                           scale, rate, interpret):
    o, lse = _fwd_packed_dispatch(q, k, v, w, tabs, kbias, ub, vb,
                                  seed, scale, rate, interpret)
    from jax.ad_checkpoint import checkpoint_name
    o = checkpoint_name(o, "flash_attn")
    lse = checkpoint_name(lse, "flash_attn_lse")
    return o, (q, k, v, w, tabs, kbias, ub, vb, seed, o, lse)


def _flash_core_packed_bwd(scale, rate, interpret, res, g):
    q, k, v, w, tabs, kbias, ub, vb, seed, o, lse = res
    N, Tp, F = q.shape
    H, Dh, D = w.shape
    # per-head dd: sum g*o over that head's lanes only
    dd = jnp.sum(
        (g.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
            N, Tp, H, Dh), axis=-1)
    dd = jnp.transpose(dd, (0, 2, 1))                   # (N, H, Tp)
    dq, dk, dv, dw, dub, dvb = _bwd_packed_dispatch(
        q, k, v, w, tabs, kbias, ub, vb, seed, lse, g.astype(q.dtype),
        dd, scale, rate, interpret)
    return (dq, dk, dv, dw.astype(w.dtype), (None,) * 4, None,
            dub.astype(ub.dtype), dvb.astype(vb.dtype), None)


_flash_core_packed.defvjp(_flash_core_packed_fwd,
                          _flash_core_packed_bwd)


def flash_relpos_attention_packed(q, k, v, w, u_bias, v_bias, kmask,
                                  *, scale=None, dropout_rate=0.0,
                                  seed=None, interpret=False):
    """Shear-free fused rel-pos attention, packed layout.

    q, k, v: (N, T, F) with F = H·Dh packed head-major (i.e. the
    DenseGeneral (H, Dh) output reshaped — a free reshape). Returns
    (N, T, F). No transposes: blocks stream directly from/to the
    projection layout; heads are an in-kernel lane-slice loop.
    w: (D, H, Dh) pos-projection kernel; u_bias/v_bias (H, Dh).
    """
    N, T, F = q.shape
    D, H, Dh = w.shape
    assert H * Dh == F and D % 2 == 0
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dh))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    Tp = _round_up(T, 8)

    def prep(x):
        if Tp == T:
            return x
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    kb = jnp.where(
        jnp.pad(kmask, ((0, 0), (0, Tp - T))), 0.0,
        NEG).astype(jnp.float32)[:, None, :]
    a, b_t, c, vt = (jnp.asarray(x) for x in _decomp_tables(Tp, D))
    tabs = (a.astype(q.dtype), b_t.astype(q.dtype),
            c.astype(q.dtype), vt.astype(q.dtype))
    wk = jnp.transpose(w, (1, 2, 0))        # (H, Dh, D) — tiny
    o = _flash_core_packed(
        prep(q), prep(k), prep(v), wk, tabs, kb,
        u_bias.reshape(1, F), v_bias.reshape(1, F), seed,
        float(scale), float(dropout_rate), interpret)
    return o[:, :T]


# ---- chunked projected-table ("band") packed kernels ----
#
# The decomp kernels above compute the rel-pos scores as bd = U @ Vᵀ
# with inner dimension D (= d_model, 512 at the flagship): the D-wide
# matmuls (bd in fwd; bd + du in bwd) are 8× the FLOPs of a Dh-wide
# formulation and dominate the kernel (round-4 trace: bwd 6.0 ms/cell
# vs ~2.7 roofline — VERDICT r4 weak #1). These variants compute bd
# the minimal-rank way instead: against the PROJECTED sinusoid table
# P[i] = pe(Tp-1-i) @ w (the (2Tp, Dh) table the stock XLA path
# materializes, cat/shared/layer.py:238-416 role), one
# (rc, Dh) @ (Dh, W) matmul per row-chunk, then extract the diagonal
# band with ceil(log2(rc)) masked lane rolls. Chunking rows to
# rc = round_up(Tp+8, 128) - Tp makes every chunk's table window
# exactly W = Tp + rc lanes — 128-aligned, so the f32 rolls stay on
# aligned tiles (the round-2 full-width shear required Tp padded to a
# power of two; this needs only pad_time8's multiple-of-8, and the
# roll traffic shrinks ~2x because the window is Tp+rc, not 2Tp).
#
# MXU cost per (item, head) in units of Tp²·Dh: fwd 1 (content) +
# ~1.3 (qp) + 1 (pv) ≈ 3.3 vs the decomp's ~11.3; bwd ~11 vs ~24.8.
# dW stays exact: the kernel emits dP and XLA backprops the outside
# einsum P = pe @ w to the projection kernel.


def _band_rc(Tp):
    """Row-chunk size making the chunk window width 128-aligned."""
    rc = -(-(Tp + 8) // 128) * 128 - Tp
    return min(rc, Tp)


def _band_pe(Tp, D):
    """Sinusoid basis in band order: row i = pe(Tp-1-i), where
    pe(d)[2f] = sin(w_f d), pe(d)[2f+1] = cos(w_f d) — the same basis
    _decomp_tables factorizes."""
    d = (Tp - 1) - np.arange(2 * Tp, dtype=np.float64)[:, None]
    w = np.exp(np.arange(0, D, 2) * (-np.log(10000.0) / D))
    ang = d * w
    pe = np.zeros((2 * Tp, D), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def _shear_right3(x, rc):
    """(NB, rc, W) → out[n, t, m] = x[n, t, m - t (mod W)]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < rc:
        x = jnp.where((rows & shift) != 0,
                      pltpu.roll(x, shift, axis=2), x)
        shift *= 2
    return x


def _shear_left3(x, rc):
    """Inverse of _shear_right3: out[n, t, m] = x[n, t, m + t]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    W = x.shape[2]
    shift = 1
    while shift < rc:
        x = jnp.where((rows & shift) != 0,
                      pltpu.roll(x, W - shift, axis=2), x)
        shift *= 2
    return x


def _band_bd_chunk(qv_c, ptab, h, t0, rc, b, W):
    """bd rows for one q chunk: bd[n, t0+t', s] = qv_c[n, t'] ·
    P[h, (b-1) - (t0+t') + s]. Mosaic note: the band is extracted
    per-chunk and consumed per-chunk (softmax rows are independent) —
    concatenating unequal-sublane chunks is not lowerable
    ("result/input offset mismatch on non-concat dimension")."""
    w0 = b - t0 - rc
    pwin = ptab[h, w0:w0 + W]                         # (W, Dh)
    qp = jax.lax.dot_general(
        qv_c.astype(pwin.dtype), pwin, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (NB, rc, W)
    import os
    if os.environ.get("CAT_TPU_BAND_NOSHEAR"):  # PERF PROBE ONLY:
        return qp[:, :, rc - 1:rc - 1 + b]      # wrong math, isolates
    sh = _shear_right3(qp, rc)                  # shear cost in traces
    return sh[:, :, rc - 1:rc - 1 + b]


def _fwd_kernel_band(seed_ref, q_ref, k_ref, v_ref, p_ref, kb_ref,
                     ub_ref, vb_ref, o_ref, lse_ref, ptab, sem,
                     *, scale, rate, H, b, Dh, NB, RC, W):
    nb = pl.program_id(0)
    _load_tables_once(nb == 0, (p_ref,), (ptab,), sem)
    q = q_ref[...]                  # (NB, b, F)
    k = k_ref[...]
    v = v_ref[...]
    ub = ub_ref[...].astype(q.dtype)
    vb = vb_ref[...].astype(q.dtype)
    kb = kb_ref[:, 0][:, None, :]
    nchunks = -(-b // RC)
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        for ci, t0 in enumerate(range(0, b, RC)):
            rc = min(RC, b - t0)
            qc = q[:, t0:t0 + rc, sl]
            s = jax.lax.dot_general(
                qc + ub[:, sl][None], kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (NB, rc, b)
            bd = _band_bd_chunk(qc + vb[:, sl][None], ptab, h, t0, rc,
                                b, W)
            s = (s + bd) * scale + kb
            m = jnp.max(s, axis=2, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=2, keepdims=True)
            if rate > 0.0:
                keeps = []
                for i in range(NB):
                    pltpu.prng_seed(
                        seed_ref[0],
                        _tile_seed(seed_ref, nb * NB + i, h, ci, 0,
                                   H, nchunks, 1))
                    keeps.append(_dropout_keep((rc, b), _thr(rate)))
                keep = jnp.stack(keeps)
                e = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
            acc = jax.lax.dot_general(
                e.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, t0:t0 + rc, sl] = (
                acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            lse_ref[:, h, t0:t0 + rc] = jnp.reshape(
                m + jnp.log(jnp.maximum(l, 1e-30)), (NB, rc))


def _bwd_kernel_band(seed_ref, q_ref, k_ref, v_ref, p_ref, kb_ref,
                     ub_ref, vb_ref, lse_ref, do_ref, dd_ref,
                     dq_ref, dk_ref, dv_ref, dp_ref, dub_ref, dvb_ref,
                     ptab, dps, dubs, dvbs, sem,
                     *, scale, rate, H, b, Dh, NB, RC, W):
    nb = pl.program_id(0)
    _load_tables_once(nb == 0, (p_ref,), (ptab,), sem)

    @pl.when(nb == 0)
    def _init_p():
        dps[...] = jnp.zeros_like(dps)
        dubs[...] = jnp.zeros_like(dubs)
        dvbs[...] = jnp.zeros_like(dvbs)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    ub = ub_ref[...].astype(q.dtype)
    vb = vb_ref[...].astype(q.dtype)
    kb = kb_ref[:, 0][:, None, :]
    nchunks = -(-b // RC)
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        # accumulated over q-row chunks (contract over q rows)
        dk_acc = jnp.zeros((NB, b, Dh), jnp.float32)
        dv_acc = jnp.zeros((NB, b, Dh), jnp.float32)
        for ci, t0 in enumerate(range(0, b, RC)):
            rc = min(RC, b - t0)
            qc = q[:, t0:t0 + rc, sl]
            doc = do[:, t0:t0 + rc, sl]
            qu = qc + ub[:, sl][None]
            qv = qc + vb[:, sl][None]
            s = jax.lax.dot_general(
                qu, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            bd = _band_bd_chunk(qv, ptab, h, t0, rc, b, W)
            s = (s + bd) * scale + kb
            p_ = jnp.exp(s - lse_ref[:, h, t0:t0 + rc][:, :, None])

            dpmat = jax.lax.dot_general(
                doc, vh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if rate > 0.0:
                keeps = []
                for i in range(NB):
                    pltpu.prng_seed(
                        seed_ref[0],
                        _tile_seed(seed_ref, nb * NB + i, h, ci, 0,
                                   H, nchunks, 1))
                    keeps.append(_dropout_keep((rc, b), _thr(rate)))
                keep = jnp.stack(keeps)
                inv = 1.0 / (1.0 - rate)
                p_drop = jnp.where(keep, p_ * inv, 0.0)
                dpmat = jnp.where(keep, dpmat * inv, 0.0)
            else:
                p_drop = p_
            dv_acc += jax.lax.dot_general(
                p_drop.astype(doc.dtype), doc,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ds = (p_ * (dpmat - dd_ref[:, h, t0:t0 + rc][:, :, None])
                  * scale)
            dsl = ds.astype(kh.dtype)
            dqu = jax.lax.dot_general(
                dsl, kh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dk_acc += jax.lax.dot_general(
                dsl, qu, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # band path: dqp = inverse shear of ds; dqv = dqp @ P_win;
            # dP_win += dqpᵀ @ qv (overlapping windows accumulate)
            w0 = b - t0 - rc
            padded = jnp.pad(ds,
                             ((0, 0), (0, 0), (rc - 1, W - b - rc + 1)))
            dqp = _shear_left3(padded, rc)             # (NB, rc, W)
            dqpl = dqp.astype(kh.dtype)
            pwin = ptab[h, w0:w0 + W]
            dqv = jax.lax.dot_general(
                dqpl, pwin, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (NB, rc, Dh)
            nbrc = NB * rc
            dps[h, w0:w0 + W] += jax.lax.dot_general(
                dqpl.reshape(nbrc, W), qv.reshape(nbrc, Dh),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (W, Dh)
            dq_ref[:, t0:t0 + rc, sl] = (dqu + dqv).astype(
                dq_ref.dtype)
            dubs[:, sl] += jnp.sum(dqu, axis=(0, 1))[None]
            dvbs[:, sl] += jnp.sum(dqv, axis=(0, 1))[None]
        dk_ref[:, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv_acc.astype(dv_ref.dtype)

    @pl.when(nb == pl.num_programs(0) - 1)
    def _flush():
        dp_ref[...] = dps[...]
        dub_ref[...] = dubs[...]
        dvb_ref[...] = dvbs[...]


def _pallas_fwd_band(q, k, v, p, kbias, ub, vb, seed, scale, rate,
                     interpret):
    N, Tp, F = q.shape
    H, M, Dh = p.shape
    RC = _band_rc(Tp)
    W = Tp + RC
    NB = _pick_nb_packed(N, Tp, F, Dh, bwd=False)
    kernel = functools.partial(_fwd_kernel_band, scale=scale,
                               rate=rate, H=H, b=Tp, Dh=Dh, NB=NB,
                               RC=RC, W=W)
    o, lse = pl.pallas_call(
        kernel,
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NB, 1, Tp), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, H, Tp), lambda nb: (nb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((N, H, Tp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((H, M, Dh), p.dtype),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, p, kbias, ub, vb)
    return o, lse


def _pallas_bwd_band(q, k, v, p, kbias, ub, vb, seed, lse, do, dd,
                     scale, rate, interpret):
    N, Tp, F = q.shape
    H, M, Dh = p.shape
    RC = _band_rc(Tp)
    W = Tp + RC
    NB = _pick_nb_packed(N, Tp, F, Dh, bwd=True)
    kernel = functools.partial(_bwd_kernel_band, scale=scale,
                               rate=rate, H=H, b=Tp, Dh=Dh, NB=NB,
                               RC=RC, W=W)
    f32 = jnp.float32
    dq, dk, dv, dp, dub, dvb = pl.pallas_call(
        kernel,
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NB, 1, Tp), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((NB, H, Tp), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, H, Tp), lambda nb: (nb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((NB, Tp, F), lambda nb: (nb, 0, 0)),
            pl.BlockSpec((H, M, Dh), lambda nb: (0, 0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
            pl.BlockSpec((1, F), lambda nb: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((N, Tp, F), q.dtype),
            jax.ShapeDtypeStruct((H, M, Dh), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
        ],
        scratch_shapes=[pltpu.VMEM((H, M, Dh), p.dtype),
                        pltpu.VMEM((H, M, Dh), f32),
                        pltpu.VMEM((1, F), f32),
                        pltpu.VMEM((1, F), f32),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, p, kbias, ub, vb, lse, do, dd)
    return dq, dk, dv, dp, dub, dvb


def _fwd_band_flat(q, k, v, p, kbias, ub, vb, seed, scale, rate,
                   interpret):
    return _pallas_fwd_band(q, k, v, p, kbias, ub, vb, seed, scale,
                            rate, interpret)


def _bwd_band_flat(q, k, v, p, kbias, ub, vb, seed, lse, do, dd,
                   scale, rate, interpret):
    return _pallas_bwd_band(q, k, v, p, kbias, ub, vb, seed, lse, do,
                            dd, scale, rate, interpret)


_fwd_band_part = make_row_partitioned(
    _fwd_band_flat, static_argnums=(8, 9, 10),
    row_args=(0, 1, 2, 4), seed_arg=7,
    out_specs=("row", "row"),
    rule="n t f, n t f, n t f, h m dh, n k1 kt, u1 uf, v1 vf, sd "
         "-> n t f, n h2 t5")
_bwd_band_part = make_row_partitioned(
    _bwd_band_flat, static_argnums=(11, 12, 13),
    row_args=(0, 1, 2, 4, 8, 9, 10), seed_arg=7,
    out_specs=("row", "row", "row", "psum", "psum", "psum"),
    rule="n t f, n t f, n t f, h m dh, n k1 kt, u1 uf, v1 vf, sd, "
         "n h2 t5, n t f, n h3 t6 "
         "-> n t f, n t f, n t f, oh om odh, ou1 ouf, ov1 ovf")


def _fwd_band_dispatch(q, k, v, p, kbias, ub, vb, seed, scale, rate,
                       interpret):
    if use_partitioned():
        return _fwd_band_part(q, k, v, p, kbias, ub, vb, seed, scale,
                              rate, interpret)
    return _pallas_fwd_band(q, k, v, p, kbias, ub, vb, seed, scale,
                            rate, interpret)


def _bwd_band_dispatch(q, k, v, p, kbias, ub, vb, seed, lse, do, dd,
                       scale, rate, interpret):
    if use_partitioned():
        return _bwd_band_part(q, k, v, p, kbias, ub, vb, seed, lse,
                              do, dd, scale, rate, interpret)
    return _pallas_bwd_band(q, k, v, p, kbias, ub, vb, seed, lse, do,
                            dd, scale, rate, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _flash_core_band(q, k, v, p, kbias, ub, vb, seed, scale, rate,
                     interpret):
    o, _ = _fwd_band_dispatch(q, k, v, p, kbias, ub, vb, seed, scale,
                              rate, interpret)
    return o


def _flash_core_band_fwd(q, k, v, p, kbias, ub, vb, seed, scale,
                         rate, interpret):
    o, lse = _fwd_band_dispatch(q, k, v, p, kbias, ub, vb, seed,
                                scale, rate, interpret)
    from jax.ad_checkpoint import checkpoint_name
    o = checkpoint_name(o, "flash_attn")
    lse = checkpoint_name(lse, "flash_attn_lse")
    return o, (q, k, v, p, kbias, ub, vb, seed, o, lse)


def _flash_core_band_bwd(scale, rate, interpret, res, g):
    q, k, v, p, kbias, ub, vb, seed, o, lse = res
    N, Tp, F = q.shape
    H, M, Dh = p.shape
    dd = jnp.sum(
        (g.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
            N, Tp, H, Dh), axis=-1)
    dd = jnp.transpose(dd, (0, 2, 1))                   # (N, H, Tp)
    dq, dk, dv, dp, dub, dvb = _bwd_band_dispatch(
        q, k, v, p, kbias, ub, vb, seed, lse, g.astype(q.dtype), dd,
        scale, rate, interpret)
    return (dq, dk, dv, dp.astype(p.dtype), None,
            dub.astype(ub.dtype), dvb.astype(vb.dtype), None)


_flash_core_band.defvjp(_flash_core_band_fwd, _flash_core_band_bwd)

_BAND_PE_CACHE = {}


def flash_relpos_attention_band(q, k, v, w, u_bias, v_bias, kmask,
                                *, scale=None, dropout_rate=0.0,
                                seed=None, interpret=False):
    """Chunked projected-table rel-pos attention, packed layout.

    Same contract as flash_relpos_attention_packed (q/k/v (N, T, F)
    head-major packed, w (D, H, Dh) pos-projection kernel), but the
    rel-pos scores go through P = pe @ w (minimal Dh-rank) instead of
    the D-wide trig-table factorization — see the section comment
    above. Same per-item dropout seed stream as the packed kernel."""
    N, T, F = q.shape
    D, H, Dh = w.shape
    assert H * Dh == F and D % 2 == 0
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dh))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    Tp = _round_up(T, 8)

    def prep(x):
        if Tp == T:
            return x
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    kb = jnp.where(
        jnp.pad(kmask, ((0, 0), (0, Tp - T))), 0.0,
        NEG).astype(jnp.float32)[:, None, :]
    key = (Tp, D)
    if key not in _BAND_PE_CACHE:
        _BAND_PE_CACHE[key] = _band_pe(Tp, D)
    pe = jnp.asarray(_BAND_PE_CACHE[key])
    # P (H, 2Tp, Dh): outside the custom_vjp, so dP backprops to dw
    # through this einsum automatically (exact dW)
    p = jnp.einsum("md,dhk->hmk", pe,
                   w.astype(jnp.float32)).astype(q.dtype)
    o = _flash_core_band(
        prep(q), prep(k), prep(v), p, kb,
        u_bias.reshape(1, F), v_bias.reshape(1, F), seed,
        float(scale), float(dropout_rate), interpret)
    return o[:, :T]


def _pick_nb(N, Tp, D, Dh, *, bwd, env=None):
    """Largest batch-block that divides N and fits a VMEM budget.

    The f32 intermediates dominate: fwd holds ~2 (b,b) + ~1.5 (b,D)
    per item; bwd ~4 (b,b) + ~2.5 (b,D). Overridable for experiments
    via CAT_TPU_FLASH_NB_FWD / CAT_TPU_FLASH_NB_BWD."""
    import os
    key = "CAT_TPU_FLASH_NB_BWD" if bwd else "CAT_TPU_FLASH_NB_FWD"
    v = os.environ.get(key) if env is None else env
    if v:
        nb = max(1, int(v))
        while N % nb:
            nb //= 2
        return max(1, nb)
    per = (4 * Tp * Tp + 2.5 * Tp * D if bwd
           else 2 * Tp * Tp + 1.5 * Tp * D) * 4 + 8 * Tp * Dh * 2
    budget = 20 * 2 ** 20 if bwd else 24 * 2 ** 20
    nb = 8
    while nb > 1 and (N % nb or nb * per > budget):
        nb //= 2
    return nb


def _pallas_fwd_decomp(q, k, v, w, tabs, kbias, ub, vb, seed, scale,
                       rate, interpret):
    N, H, Tp, Dh = q.shape
    D = w.shape[-1]
    a, b_t, c, vt = tabs
    NB = _pick_nb(N, Tp, D, Dh, bwd=False)
    kernel = functools.partial(_fwd_kernel_decomp, scale=scale,
                               rate=rate, H=H, b=Tp, D=D, NB=NB)
    o, lse = pl.pallas_call(
        kernel,
        grid=(H, N // NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((1, Dh, D), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NB, 1, Tp), lambda h, nb: (nb, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, nb: (h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, 1, Tp), lambda h, nb: (nb, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((N, H, 1, Tp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, w, a, b_t, c, vt, kbias, ub, vb)
    return o, lse


def _pallas_bwd_decomp(q, k, v, w, tabs, kbias, ub, vb, seed, lse, do,
                       dd, scale, rate, interpret):
    N, H, Tp, Dh = q.shape
    D = w.shape[-1]
    a, b_t, c, vt = tabs
    NB = _pick_nb(N, Tp, D, Dh, bwd=True)
    kernel = functools.partial(_bwd_kernel_decomp, scale=scale,
                               rate=rate, H=H, b=Tp, D=D, NB=NB)
    f32 = jnp.float32
    dq, dk, dv, dw, dub, dvb = pl.pallas_call(
        kernel,
        grid=(H, N // NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((1, Dh, D), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NB, 1, Tp), lambda h, nb: (nb, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec((NB, 1, 1, Tp), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, 1, Tp), lambda h, nb: (nb, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, Tp, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((1, Dh, D), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, nb: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((H, Dh, D), f32),
            jax.ShapeDtypeStruct((H, 1, Dh), f32),
            jax.ShapeDtypeStruct((H, 1, Dh), f32),
        ],
        scratch_shapes=[pltpu.VMEM((Dh, D), f32),
                        pltpu.VMEM((1, Dh), f32),
                        pltpu.VMEM((1, Dh), f32),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.VMEM((Tp, D), a.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, w, a, b_t, c, vt, kbias, ub, vb, lse, do, dd)
    return dq, dk, dv, dw, dub, dvb


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _flash_core_decomp(q, k, v, w, tabs, kbias, ub, vb, seed, scale,
                       rate, interpret):
    o, _ = _pallas_fwd_decomp(q, k, v, w, tabs, kbias, ub, vb, seed,
                              scale, rate, interpret)
    return o


def _flash_core_decomp_fwd(q, k, v, w, tabs, kbias, ub, vb, seed, scale,
                           rate, interpret):
    o, lse = _pallas_fwd_decomp(q, k, v, w, tabs, kbias, ub, vb, seed,
                                scale, rate, interpret)
    from jax.ad_checkpoint import checkpoint_name
    o = checkpoint_name(o, "flash_attn")
    lse = checkpoint_name(lse, "flash_attn_lse")
    return o, (q, k, v, w, tabs, kbias, ub, vb, seed, o, lse)


def _flash_core_decomp_bwd(scale, rate, interpret, res, g):
    q, k, v, w, tabs, kbias, ub, vb, seed, o, lse = res
    dd = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1)[:, :, None, :]
    dq, dk, dv, dw, dub, dvb = _pallas_bwd_decomp(
        q, k, v, w, tabs, kbias, ub, vb, seed, lse, g.astype(q.dtype),
        dd, scale, rate, interpret)
    return (dq, dk, dv, dw.astype(w.dtype), (None,) * 4, None,
            dub.astype(ub.dtype), dvb.astype(vb.dtype), None)


_flash_core_decomp.defvjp(_flash_core_decomp_fwd, _flash_core_decomp_bwd)


def flash_relpos_attention_decomp(q, k, v, w, u_bias, v_bias, kmask, *,
                                  scale=None, dropout_rate=0.0,
                                  seed=None, interpret=False):
    """Shear-free fused rel-pos attention (single whole-sequence tile).

    Same contract as flash_relpos_attention but takes the pos-projection
    kernel `w: (D, H, Dh)` (the DenseGeneral "pos" kernel) instead of
    the projected table p — the sinusoid basis is folded into static
    trig tables (see _decomp_tables), so the rel-pos scores become one
    MXU matmul per tile and the gradient w.r.t. w is returned exactly.
    Requires the standard rel_positional_encoding basis for d_model = D.
    """
    N, T, H, Dh = q.shape
    D = w.shape[0]
    assert D % 2 == 0
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dh))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    # sublane-granular padding: the decomp kernel has no wide-lane rolls
    # (only D-lane rolls), so T needs only 8-row alignment — at the
    # flagship T'=399 this cuts 22% of padded rows vs rounding to 128.
    # Device-validated (tools/device_checks.py) for bf16 at Tp ≡ 8
    # (mod 16), e.g. T=197→Tp=200: fwd+all grads within bf16 tolerance;
    # f32 under default_matmul_precision("float32") parity ~3e-5.
    Tp = _round_up(T, 8)

    def prep(x):  # (N, T, H, Dh) -> (N, H, Tp, Dh)
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    kb = jnp.where(
        jnp.pad(kmask, ((0, 0), (0, Tp - T))), 0.0,
        NEG).astype(jnp.float32)[:, None, :]
    a, b_t, c, vt = (jnp.asarray(x) for x in _decomp_tables(Tp, D))
    tabs = (a.astype(q.dtype), b_t.astype(q.dtype),
            c.astype(q.dtype), vt.astype(q.dtype))
    wk = jnp.transpose(w, (1, 2, 0))  # (H, Dh, D)
    o = _flash_core_decomp(
        prep(q), prep(k), prep(v), wk, tabs, kb,
        u_bias[:, None, :], v_bias[:, None, :], seed,
        float(scale), float(dropout_rate), interpret)
    return jnp.transpose(o[:, :, :T, :], (0, 2, 1, 3))


def _pallas_fwd_single(q, k, v, pp, kbias, ub, vb, seed, scale, rate,
                       interpret):
    N, H, Tp, Dh = q.shape
    kernel = functools.partial(_fwd_kernel_single, scale=scale,
                               rate=rate, H=H, b=Tp)
    o, lse = pl.pallas_call(
        kernel,
        grid=(N, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Tp, Dh), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, 2 * Tp, Dh), lambda n, h: (h, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda n, h: (n, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda n, h: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda n, h: (h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Tp, Dh), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Tp), lambda n, h: (n, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((N, H, 1, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, pp, kbias, ub, vb)
    return o, lse


def _pallas_bwd_single(q, k, v, pp, kbias, ub, vb, seed, lse, do, dd,
                       scale, rate, interpret):
    N, H, Tp, Dh = q.shape
    kernel = functools.partial(_bwd_kernel_single, scale=scale,
                               rate=rate, H=H, b=Tp)
    f32 = jnp.float32
    dq, dk, dv, dp, dub, dvb = pl.pallas_call(
        kernel,
        grid=(H, N),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 2 * Tp, Dh), lambda h, n: (h, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda h, n: (n, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, n: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, n: (h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Tp), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Tp), lambda h, n: (n, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n: (n, h, 0, 0)),
            pl.BlockSpec((1, 2 * Tp, Dh), lambda h, n: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, n: (h, 0, 0)),
            pl.BlockSpec((1, 1, Dh), lambda h, n: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((H, 2 * Tp, Dh), f32),
            jax.ShapeDtypeStruct((H, 1, Dh), f32),
            jax.ShapeDtypeStruct((H, 1, Dh), f32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * Tp, Dh), f32),
                        pltpu.VMEM((1, Dh), f32),
                        pltpu.VMEM((1, Dh), f32)],
        interpret=interpret,
    )(seed, q, k, v, pp, kbias, ub, vb, lse, do, dd)
    return dq, dk, dv, dp, dub, dvb


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _flash_core_single(q, k, v, pp, kbias, ub, vb, seed, scale, rate,
                       interpret):
    o, _ = _pallas_fwd_single(q, k, v, pp, kbias, ub, vb, seed, scale,
                              rate, interpret)
    return o


def _flash_core_single_fwd(q, k, v, pp, kbias, ub, vb, seed, scale,
                           rate, interpret):
    o, lse = _pallas_fwd_single(q, k, v, pp, kbias, ub, vb, seed, scale,
                                rate, interpret)
    # name the kernel outputs so a remat policy can elect to store them
    # (saving the backward from re-running the fused forward just to
    # rebuild these residuals) — encoders.dots_noexpand + names policy
    from jax.ad_checkpoint import checkpoint_name
    o = checkpoint_name(o, "flash_attn")
    lse = checkpoint_name(lse, "flash_attn_lse")
    return o, (q, k, v, pp, kbias, ub, vb, seed, o, lse)


def _flash_core_single_bwd(scale, rate, interpret, res, g):
    q, k, v, pp, kbias, ub, vb, seed, o, lse = res
    dd = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1)[:, :, None, :]
    dq, dk, dv, dp, dub, dvb = _pallas_bwd_single(
        q, k, v, pp, kbias, ub, vb, seed, lse, g.astype(q.dtype), dd,
        scale, rate, interpret)
    return (dq, dk, dv, dp.astype(pp.dtype), None,
            dub.astype(ub.dtype), dvb.astype(vb.dtype), None)


_flash_core_single.defvjp(_flash_core_single_fwd, _flash_core_single_bwd)


def _pallas_fwd(qu, qv, k, v, pp, kbias, seed, scale, rate, b, interpret):
    N, H, Tp, Dh = qu.shape
    nq = nk = Tp // b
    grid = (N, H, nq, nk)
    kernel = functools.partial(_fwd_kernel, scale=scale, rate=rate,
                               H=H, nq=nq, nk=nk, b=b)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, b, Dh), lambda n, h, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda n, h, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda n, h, i, j: (n, h, j, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda n, h, i, j: (n, h, j, 0)),
            pl.BlockSpec((1, b, Dh),
                         lambda n, h, i, j: (h, nq - 1 + j - i, 0)),
            pl.BlockSpec((1, b, Dh),
                         lambda n, h, i, j: (h, nq + j - i, 0)),
            pl.BlockSpec((1, 1, b), lambda n, h, i, j: (n, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b, Dh), lambda n, h, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, 1, b), lambda n, h, i, j: (n, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, Tp, Dh), qu.dtype),
            jax.ShapeDtypeStruct((N, H, 1, Tp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, Dh), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qu, qv, k, v, pp, pp, kbias)
    return o, lse


def _pallas_bwd(qu, qv, k, v, pp, kbias, seed, lse, do, dd,
                scale, rate, b, interpret):
    N, H, Tp, Dh = qu.shape
    nq = nk = Tp // b
    grid = (H, N, nq, nk)
    kernel = functools.partial(_bwd_kernel, scale=scale, rate=rate,
                               H=H, nq=nq, nk=nk, b=b)
    f32 = jnp.float32
    dqu, dqv, dk, dv, dp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, j, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, j, 0)),
            pl.BlockSpec((1, b, Dh),
                         lambda h, n, i, j: (h, nq - 1 + j - i, 0)),
            pl.BlockSpec((1, b, Dh),
                         lambda h, n, i, j: (h, nq + j - i, 0)),
            pl.BlockSpec((1, 1, b), lambda h, n, i, j: (n, 0, j)),
            pl.BlockSpec((1, 1, 1, b), lambda h, n, i, j: (n, h, 0, i)),
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, 1, b), lambda h, n, i, j: (n, h, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, b, Dh), lambda h, n, i, j: (n, h, i, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n, i, j: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, Dh), lambda h, n, i, j: (n, h, 0, 0)),
            pl.BlockSpec((1, 2 * Tp, Dh), lambda h, n, i, j: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, Tp, Dh), f32),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), f32),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), f32),
            jax.ShapeDtypeStruct((N, H, Tp, Dh), f32),
            jax.ShapeDtypeStruct((H, 2 * Tp, Dh), f32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * Tp, Dh), f32)],
        interpret=interpret,
    )(seed, qu, qv, k, v, pp, pp, kbias, lse, do, dd)
    return dqu, dqv, dk, dv, dp


# k-block slicing of dk/dv inside the backward kernel reads/writes a
# (1, 1, Tp, Dh) output block per (h, n); the kernel needs nk tiles of it.


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _flash_core(qu, qv, k, v, pp, kbias, seed, scale, rate, b, interpret):
    o, _ = _pallas_fwd(qu, qv, k, v, pp, kbias, seed, scale, rate, b,
                       interpret)
    return o


def _flash_core_fwd(qu, qv, k, v, pp, kbias, seed, scale, rate, b,
                    interpret):
    o, lse = _pallas_fwd(qu, qv, k, v, pp, kbias, seed, scale, rate, b,
                         interpret)
    return o, (qu, qv, k, v, pp, kbias, seed, o, lse)


def _flash_core_bwd(scale, rate, b, interpret, res, g):
    qu, qv, k, v, pp, kbias, seed, o, lse = res
    dd = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1)[:, :, None, :]
    dqu, dqv, dk, dv, dp = _pallas_bwd(
        qu, qv, k, v, pp, kbias, seed, lse, g.astype(qu.dtype), dd,
        scale, rate, b, interpret)
    return (dqu.astype(qu.dtype), dqv.astype(qv.dtype),
            dk.astype(k.dtype), dv.astype(v.dtype), dp.astype(pp.dtype),
            None, None)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_relpos_attention(q, k, v, p, u_bias, v_bias, kmask, *,
                           scale=None, dropout_rate=0.0, seed=None,
                           block=256, interpret=False):
    """Fused rel-pos attention. Shapes follow the MHSA layer:

      q, k, v : (N, T, H, Dh)      p : (2T-1, H, Dh)
      u_bias, v_bias : (H, Dh)     kmask : (N, T) bool (valid keys)

    Returns (N, T, H, Dh) — softmax((q+u)·kᵀ + shift((q+v)·pᵀ))·scale)·v,
    with padded keys masked out. Invalid *query* rows are NOT zeroed
    (callers mask them, matching the layer). `seed` is a (2,) int32 array
    for the in-kernel dropout PRNG (required if dropout_rate > 0).
    """
    N, T, H, Dh = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dh))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    kb_of = lambda Tp: jnp.where(
        jnp.pad(kmask, ((0, 0), (0, Tp - T))), 0.0,
        NEG).astype(jnp.float32)[:, None, :]

    if T <= max(block, 512):
        # whole-sequence tile (the common ASR shape): one (n, h) grid
        # step, Dh kept at its native width, biases added in-kernel
        Tp = _round_up(T, 128)

        def prep(x):  # (N, T, H, Dh) → (N, H, Tp, Dh)
            x = jnp.transpose(x, (0, 2, 1, 3))
            return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

        pt = jnp.transpose(p, (1, 0, 2))  # (H, 2T-1, Dh)
        pp = jnp.pad(pt, ((0, 0), (Tp - T, Tp - T + 1), (0, 0)))
        o = _flash_core_single(
            prep(q), prep(k), prep(v), pp, kb_of(Tp),
            u_bias[:, None, :], v_bias[:, None, :], seed,
            float(scale), float(dropout_rate), interpret)
        return jnp.transpose(o[:, :, :T, :], (0, 2, 1, 3))

    b = min(block, _round_up(T, 128))
    Tp = _round_up(T, b)
    Dp = _round_up(Dh, 128)

    def prep(x):  # (N, T, H, Dh) → padded (N, H, Tp, Dp)
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - Dh)))

    qu = prep(q + u_bias[None, None])
    qv = prep(q + v_bias[None, None])
    kp = prep(k)
    vp = prep(v)
    # p table in padded coordinates: p_pad[h, m'] = p[m' - (Tp - T), h]
    # for m' in [Tp-T, Tp+T-1), zeros elsewhere (only masked entries hit
    # the zero region). Shape (H, 2Tp, Dp).
    pt = jnp.transpose(p, (1, 0, 2))  # (H, 2T-1, Dh)
    pp = jnp.pad(pt, ((0, 0), (Tp - T, Tp - T + 1), (0, Dp - Dh)))
    kb = kb_of(Tp)
    o = _flash_core(qu, qv, kp, vp, pp, kb, seed,
                    float(scale), float(dropout_rate), b, interpret)
    o = o[:, :, :T, :Dh]
    return jnp.transpose(o, (0, 2, 1, 3))


def relpos_attention_reference(q, k, v, p, u_bias, v_bias, kmask,
                               scale=None):
    """Pure-XLA reference (no dropout), same math as the MHSA layer."""
    N, T, H, Dh = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dh))
    ac = jnp.einsum("nthd,nshd->nhts", q + u_bias[None, None], k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("nthd,mhd->nhtm", q + v_bias[None, None], p,
                    preferred_element_type=jnp.float32)
    x = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(N, H, 2 * T, T)[:, :, 1:, :]
    bd = x.reshape(N, H, T, 2 * T - 1)[..., :T]
    s = (ac + bd) * scale
    s = jnp.where(kmask[:, None, None, :], s, NEG)
    attn = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("nhts,nshd->nthd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
