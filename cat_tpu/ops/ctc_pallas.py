"""Pallas TPU kernels for the CTC lattice scans.

Fused replacements for the `lax.scan` alpha/beta recursions in
cat_tpu.ops.ctc (the warp-ctc role, gpu_ctc_kernels.h): the whole
T-loop runs inside ONE kernel with the (N, S) state resident in VMEM —
no per-iteration carry round-trips to HBM and all elementwise work
(two shifted reads + 3-way log-sum-exp + emission add) fused on the VPU.

Layout: S (lattice states) is padded to a multiple of 128 lanes and N
(batch) to 8 sublanes. The emission table streams T×(N, S) blocks from
HBM via the grid (Pallas double-buffers block loads automatically);
alphas/betas stream back out the same way.

Semantics are identical to the lax.scan path — golden-tested against it
in tests/test_ctc_pallas.py (interpret mode on CPU; compiled on TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cat_tpu.ops.semiring import LOG_EPS


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _lae3(a, b, c):
    """Branch-free log-add-exp of three log values, LOG_EPS-floored."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG_EPS)
    s = (jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
         + jnp.exp(c - m_safe))
    out = m_safe + jnp.log(s)
    return jnp.where(m <= LOG_EPS / 2, LOG_EPS, out)


def _shift_right_lanes(x, k):
    """x[..., s-k] with LOG_EPS fill (lane axis = -1)."""
    rolled = pltpu.roll(x, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < k, LOG_EPS, rolled)


def _shift_left_lanes(x, k):
    S = x.shape[1]
    rolled = pltpu.roll(x, S - k, axis=1)  # roll takes shift ≥ 0
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= S - k, LOG_EPS, rolled)


def _alpha_kernel(em_ref, allow2_ref, out_ref, alpha_ref):
    """Grid step t: alpha ← em_t + LAE(alpha, alpha≫1, alpha≫2·mask)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, alpha_ref.shape, 1)
        alpha_ref[:] = jnp.where(lane == 0, 0.0, LOG_EPS)

    alpha = alpha_ref[:]
    a1 = _shift_right_lanes(alpha, 1)
    a2 = jnp.where(allow2_ref[:] != 0, _shift_right_lanes(alpha, 2),
                   LOG_EPS)
    nxt = jnp.maximum(em_ref[0] + _lae3(alpha, a1, a2), LOG_EPS)
    alpha_ref[:] = nxt
    out_ref[0] = nxt


def _beta_kernel(em_ref, allow2dst_ref, beta_last_ref, out_ref,
                 beta_ref):
    """Reverse grid step i (frame t = T−1−i), producing beta rows.

    betas[T−1] = beta_last; for t < T−1:
      b      = max(em[t+1] + betas[t+1], LOG_EPS)
      betas[t] = max(LAE(b, b≪1, b≪2·mask_dst), LOG_EPS)
    — exactly the reverse lax.scan in ctc.py:_ctc_nll_bwd.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        beta_ref[:] = beta_last_ref[:]
        out_ref[0] = beta_last_ref[:]

    @pl.when(i != 0)
    def _():
        b = jnp.maximum(em_ref[0] + beta_ref[:], LOG_EPS)
        b1 = _shift_left_lanes(b, 1)
        b2 = jnp.where(allow2dst_ref[:] != 0, _shift_left_lanes(b, 2),
                       LOG_EPS)
        prv = jnp.maximum(_lae3(b, b1, b2), LOG_EPS)
        beta_ref[:] = prv
        out_ref[0] = prv


def _pad_nsl(x, N_p, S_p, fill):
    N, S = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, N_p - N), (0, S_p - S)),
                   constant_values=fill)


def forward_alphas_pallas(em, allow2, interpret=False):
    """All alpha rows (T, N, S) — Pallas version of _forward_alphas."""
    T, N, S = em.shape
    N_p, S_p = _round_up(N, 8), _round_up(S, 128)
    em_p = _pad_nsl(em.astype(jnp.float32), N_p, S_p, LOG_EPS)
    a2 = jnp.pad(allow2.astype(jnp.int32),
                 ((0, N_p - N), (0, S_p - S)))
    out = pl.pallas_call(
        _alpha_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N_p, S_p), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_p, S_p), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_p, S_p), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N_p, S_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N_p, S_p), jnp.float32)],
        interpret=interpret,
    )(em_p, a2)
    return out[:, :N, :S]


def backward_betas_pallas(em, allow2_dst, beta_last, interpret=False):
    """All beta rows (T, N, S) — Pallas version of the reverse scan."""
    T, N, S = em.shape
    N_p, S_p = _round_up(N, 8), _round_up(S, 128)
    em_p = _pad_nsl(em.astype(jnp.float32), N_p, S_p, LOG_EPS)
    a2 = jnp.pad(allow2_dst.astype(jnp.int32),
                 ((0, N_p - N), (0, S_p - S)))
    bl = jnp.pad(beta_last.astype(jnp.float32),
                 ((0, N_p - N), (0, S_p - S)),
                 constant_values=LOG_EPS)
    out = pl.pallas_call(
        _beta_kernel,
        grid=(T,),
        in_specs=[
            # grid step i consumes em[t+1] where t = T−1−i (clamped —
            # the i = 0 block is unused)
            pl.BlockSpec((1, N_p, S_p),
                         lambda i: (jnp.minimum(T - i, T - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_p, S_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_p, S_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_p, S_p),
                               lambda i: (T - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N_p, S_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N_p, S_p), jnp.float32)],
        interpret=interpret,
    )(em_p, a2, bl)
    return out[:, :N, :S]
