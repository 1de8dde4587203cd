"""Pallas TPU kernels for the RNN-T lattice scans.

Fused replacements for the `lax.scan` alpha/beta recursions in
cat_tpu.ops.rnnt (the warp_rnnt role): the whole T-loop runs inside ONE
kernel with the (N, U+1) row state resident in VMEM. The per-frame
first-order linear recurrence along U —

    a[u] = logaddexp(base[u], m[u] + a[u-1])

— is solved by a Hillis-Steele scan over the lane axis in the log
(⊕ = logaddexp, ⊗ = +) semiring: log2(U_pad) combine steps of
(multiplier, addend) pairs, each a pltpu.roll + elementwise VPU work.
The beta recursion is the mirrored suffix scan (left shifts).

Layout: U+1 padded to a multiple of 128 lanes, N to 8 sublanes. The
blank/label transition tables stream T×(N, U) blocks from HBM via the
grid; alpha/beta rows stream back out the same way.

Semantics are identical to the lax.scan + associative_scan path —
golden-tested against it in tests/test_rnnt_pallas.py (interpret mode
on CPU; compiled on TPU). Opt in with CAT_TPU_RNNT_IMPL=pallas.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cat_tpu.ops.semiring import LOG_EPS


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _lae2(a, b):
    """Branch-free logaddexp with LOG_EPS floor."""
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, LOG_EPS)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m <= LOG_EPS / 2, LOG_EPS, out)


def _shift_right(x, k, fill):
    """x[..., u-k] with `fill` in the first k lanes (lane axis = -1)."""
    rolled = pltpu.roll(x, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < k, fill, rolled)


def _shift_left(x, k, fill):
    U = x.shape[1]
    rolled = pltpu.roll(x, U - k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= U - k, fill, rolled)


def _linrec_prefix(m, a, U_p):
    """Hillis-Steele prefix scan of (m, a) pairs (log semiring):
    result[u] = a[u] ⊕ m[u]⊗a[u-1] ⊕ m[u]⊗m[u-1]⊗a[u-2] ⊕ …
    Identity element for out-of-range partners: (0.0, LOG_EPS)."""
    d = 1
    while d < U_p:
        pm = _shift_right(m, d, 0.0)
        pa = _shift_right(a, d, LOG_EPS)
        # combine(partner=earlier x, self=later y):
        #   m' = y.m + x.m ; a' = y.a ⊕ (y.m + x.a)
        a = _lae2(a, jnp.maximum(m + pa, LOG_EPS))
        m = jnp.maximum(m + pm, LOG_EPS)
        d *= 2
    return a


def _linrec_suffix(m, a, U_p):
    """Mirrored suffix scan: result[u] = a[u] ⊕ m[u]⊗result[u+1]."""
    d = 1
    while d < U_p:
        pm = _shift_left(m, d, 0.0)
        pa = _shift_left(a, d, LOG_EPS)
        a = _lae2(a, jnp.maximum(m + pa, LOG_EPS))
        m = jnp.maximum(m + pm, LOG_EPS)
        d *= 2
    return a


def _alpha_kernel(bprev_ref, lab_ref, out_ref, alpha_ref):
    """Grid step t: alpha row t from row t-1.

    base[u] = max(alpha + blank_eff[t-1], LOG_EPS)   (t=0: base=alpha0)
    m[u]    = label_eff[t][u-1]
    alpha   = linrec(m, base), clamped.
    """
    t = pl.program_id(0)
    U_p = alpha_ref.shape[1]

    @pl.when(t == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, alpha_ref.shape, 1)
        alpha_ref[:] = jnp.where(lane == 0, 0.0, LOG_EPS)

    alpha = alpha_ref[:]
    is0 = (t == 0)
    base = jnp.where(is0, alpha,
                     jnp.maximum(alpha + bprev_ref[0], LOG_EPS))
    m = _shift_right(lab_ref[0], 1, LOG_EPS)
    row = jnp.maximum(_linrec_prefix(m, base, U_p), LOG_EPS)
    alpha_ref[:] = row
    out_ref[0] = row


def _beta_kernel(b_ref, lab_ref, term_ref, out_ref, beta_ref):
    """Reverse grid step i (frame t = T−1−i):
    base[u]   = max(blank_eff[t] + beta_next[u], LOG_EPS)
    beta[t,u] = logaddexp(base[u], label_eff[t][u] + beta[t,u+1])
    beta_next for i=0 is the termination row."""
    i = pl.program_id(0)
    U_p = beta_ref.shape[1]

    @pl.when(i == 0)
    def _():
        beta_ref[:] = term_ref[:]

    beta_next = beta_ref[:]
    base = jnp.maximum(b_ref[0] + beta_next, LOG_EPS)
    row = jnp.maximum(_linrec_suffix(lab_ref[0], base, U_p), LOG_EPS)
    beta_ref[:] = row
    out_ref[0] = row


def _pad_tnu(x, N_p, U_p, fill):
    N, U = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, N_p - N), (0, U_p - U)),
                   constant_values=fill)


def forward_alphas_pallas(blank_eff, label_eff, interpret=False):
    """All alpha rows (T, N, U1) — Pallas version of
    rnnt._forward_alphas."""
    T, N, U1 = blank_eff.shape
    N_p, U_p = _round_up(N, 8), _round_up(U1, 128)
    # pad lanes: blank 0.0 (log-prob of a free ride is irrelevant there —
    # alpha stays LOG_EPS), labels LOG_EPS (no transition into pad lanes)
    b_p = _pad_tnu(blank_eff.astype(jnp.float32), N_p, U_p, 0.0)
    l_p = _pad_tnu(label_eff.astype(jnp.float32), N_p, U_p, LOG_EPS)
    out = pl.pallas_call(
        _alpha_kernel,
        grid=(T,),
        in_specs=[
            # step t reads blank_eff[t-1] (clamped; unused at t=0)
            pl.BlockSpec((1, N_p, U_p),
                         lambda t: (jnp.maximum(t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_p, U_p), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_p, U_p), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N_p, U_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N_p, U_p), jnp.float32)],
        interpret=interpret,
    )(b_p, l_p)
    return out[:, :N, :U1]


def backward_betas_pallas(blank_eff, label_eff, beta_term,
                          interpret=False):
    """All beta rows (T, N, U1) — Pallas version of
    rnnt._backward_betas (betas[t] = beta at row t)."""
    T, N, U1 = blank_eff.shape
    N_p, U_p = _round_up(N, 8), _round_up(U1, 128)
    b_p = _pad_tnu(blank_eff.astype(jnp.float32), N_p, U_p, 0.0)
    l_p = _pad_tnu(label_eff.astype(jnp.float32), N_p, U_p, LOG_EPS)
    term = jnp.pad(beta_term.astype(jnp.float32),
                   ((0, N_p - N), (0, U_p - U1)),
                   constant_values=LOG_EPS)
    out = pl.pallas_call(
        _beta_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N_p, U_p), lambda i: (T - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_p, U_p), lambda i: (T - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_p, U_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_p, U_p),
                               lambda i: (T - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N_p, U_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N_p, U_p), jnp.float32)],
        interpret=interpret,
    )(b_p, l_p, term)
    return out[:, :N, :U1]
