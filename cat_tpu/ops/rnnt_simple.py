"""Fused "simple" RNN-T loss (LogAdd joiner) — no (N,T,U,V) lattice.

Replaces warp_rnnt.rnnt_loss_simple used by the reference for
memory-bound large-vocab training (/root/reference/cat/rnnt/train.py:
206-213, joiner.py:212+ LogAdd): the joiner is additive,
logit[t,u,v] = f[t,v] + g[u,v], so

  logZ[t,u]     = LSE_v(f[t,v] + g[u,v])   — one exp-domain MXU matmul
  blank_lp[t,u] = f[t,0] + g[u,0] − logZ[t,u]
  label_lp[t,u] = f[t,y_{u+1}] + g[u,y_{u+1}] − logZ[t,u]

and the DP runs on (N,T,U) tables only. Gradients wrt f and g are again
matmuls (posterior-weighted softmax sums). Memory: O(N(TU + TV + UV))
vs O(N·T·U·V) for the dense path — the difference between fitting
wenetspeech-scale batches in HBM or not.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.semiring import LOG_EPS, safe_logaddexp
from cat_tpu.ops.rnnt import _forward_alphas, _backward_betas


def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _log_matmul_z(f, g):
    """logZ (N, T, U1) = LSE_v(f[n,t,v] + g[n,u,v]) via exp matmul."""
    mf = jnp.max(f, axis=-1, keepdims=True)          # (N, T, 1)
    mg = jnp.max(g, axis=-1, keepdims=True)          # (N, U, 1)
    ef = jnp.exp(f - mf)
    eg = jnp.exp(g - mg)
    z = jnp.einsum("ntv,nuv->ntu", ef, eg,
                   preferred_element_type=jnp.float32)
    return mf + jnp.transpose(mg, (0, 2, 1)) + jnp.log(
        jnp.maximum(z, 1e-37))


def _tables(f, g, labels, input_lengths, label_lengths):
    """blank/label effective transition tables (T, N, U1) + raw."""
    N, T, V = f.shape
    U1 = g.shape[1]
    logz = _log_matmul_z(f, g)                        # (N, T, U1)
    blank_raw = f[:, :, 0][:, :, None] + g[:, :, 0][:, None, :] - logz
    lab_idx = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)], axis=1)
    # gather f[t, y_u] and g[u, y_u] separately then add
    fy = jnp.take_along_axis(
        f, jnp.broadcast_to(lab_idx[:, None, :], (N, T, U1)),
        axis=2)                                        # (N, T, U1)
    gy = jnp.take_along_axis(g, lab_idx[:, :, None], axis=2)[..., 0]
    label_raw = fy + gy[:, None, :] - logz
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    frame_valid = t_idx < input_lengths[:, None, None]
    u_valid = u_idx < label_lengths[:, None, None]
    blank_eff = jnp.where(frame_valid, blank_raw, 0.0)
    label_eff = jnp.where(frame_valid & u_valid, label_raw, LOG_EPS)
    tr = lambda x: jnp.transpose(x, (1, 0, 2))
    return (tr(blank_eff), tr(label_eff), tr(blank_raw), tr(label_raw),
            logz)


def _impl(f, g, labels, input_lengths, label_lengths):
    blank_eff, label_eff, blank_raw, label_raw, logz = _tables(
        f, g, labels, input_lengths, label_lengths)
    alphas = _forward_alphas(blank_eff, label_eff)
    N = f.shape[0]
    n_idx = jnp.arange(N)
    ll = (alphas[-1][n_idx, label_lengths]
          + blank_eff[-1][n_idx, label_lengths])
    return -ll, (blank_eff, label_eff, blank_raw, label_raw, alphas, ll)


@jax.custom_vjp
def _rnnt_nll_simple(f, g, labels, input_lengths, label_lengths):
    nll, _ = _impl(f, g, labels, input_lengths, label_lengths)
    return nll


def _fwd(f, g, labels, input_lengths, label_lengths):
    nll, res = _impl(f, g, labels, input_lengths, label_lengths)
    blank_eff, label_eff, blank_raw, label_raw, alphas, ll = res
    return nll, (f, g, labels, input_lengths, label_lengths, blank_eff,
                 label_eff, blank_raw, label_raw, alphas, ll)


def _bwd(res, gcot):
    (f, g, labels, input_lengths, label_lengths, blank_eff, label_eff,
     blank_raw, label_raw, alphas, ll) = res
    N, T, V = f.shape
    U1 = g.shape[1]
    betas, beta_term = _backward_betas(blank_eff, label_eff,
                                       label_lengths)
    betas_next = jnp.concatenate([betas[1:], beta_term[None]], axis=0)
    ll_safe = jnp.where(ll <= LOG_EPS / 2, 0.0, ll)[None, :, None]
    t_idx = jnp.arange(T)[:, None, None]
    u_idx = jnp.arange(U1)[None, None, :]
    frame_valid = t_idx < input_lengths[None, :, None]
    u_valid_b = u_idx <= label_lengths[None, :, None]
    u_valid_l = u_idx < label_lengths[None, :, None]

    sb = alphas + blank_raw + betas_next - ll_safe
    pos_blank = jnp.where(frame_valid & u_valid_b & (sb > LOG_EPS / 2),
                          jnp.exp(sb), 0.0)
    beta_up = jnp.concatenate(
        [betas[:, :, 1:], jnp.full((T, N, 1), LOG_EPS)], axis=2)
    sl = alphas + label_raw + beta_up - ll_safe
    pos_label = jnp.where(frame_valid & u_valid_l & (sl > LOG_EPS / 2),
                          jnp.exp(sl), 0.0)

    gw = gcot[None, :, None]
    pos_blank = jnp.transpose(pos_blank * gw, (1, 0, 2))  # (N, T, U1)
    pos_label = jnp.transpose(pos_label * gw, (1, 0, 2))
    q = pos_blank + pos_label                              # (N, T, U1)

    # softmax term: p[t,u,v] = exp(f+g-logZ); sum_u q·p via matmuls with
    # per-axis max shifts folded into a per-(t,u) scale (no underflow).
    logz = _log_matmul_z(f, g)                              # (N, T, U1)
    mf = jnp.max(f, axis=-1, keepdims=True)
    mg = jnp.max(g, axis=-1, keepdims=True)
    ef = jnp.exp(f - mf)
    eg = jnp.exp(g - mg)
    # p[t,u,v] = ef[t,v]*eg[u,v]*exp(mf[t]+mg[u]-logz[t,u])
    scale = jnp.exp(mf + jnp.transpose(mg, (0, 2, 1)) - logz)  # (N,T,U)
    qs = q * scale
    soft_f = ef * jnp.einsum("ntu,nuv->ntv", qs, eg,
                             preferred_element_type=jnp.float32)
    soft_g = eg * jnp.einsum("ntu,ntv->nuv", qs, ef,
                             preferred_element_type=jnp.float32)

    # delta terms
    lab_idx = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)], axis=1)
    onehot = jax.nn.one_hot(lab_idx, V)                    # (N, U1, V)
    delta_f = (pos_blank.sum(axis=2)[:, :, None]
               * jax.nn.one_hot(0, V)[None, None, :]
               + jnp.einsum("ntu,nuv->ntv", pos_label, onehot))
    delta_g = (pos_blank.sum(axis=1)[:, :, None]
               * jax.nn.one_hot(0, V)[None, None, :]
               + pos_label.sum(axis=1)[:, :, None] * onehot)

    grad_f = -(delta_f - soft_f)
    grad_g = -(delta_g - soft_g)
    return (grad_f, grad_g, _float0_zeros(labels),
            _float0_zeros(input_lengths), _float0_zeros(label_lengths))


_rnnt_nll_simple.defvjp(_fwd, _bwd)


def rnnt_loss_simple(f, g, labels, input_lengths, label_lengths,
                     reduction="mean"):
    """Fused additive-joiner RNN-T loss.

    Args:
      f: (N, T, V) encoder projections (unnormalized).
      g: (N, U+1, V) predictor projections (unnormalized), g[:, 0] for
        <bos>.
      labels / input_lengths / label_lengths: as rnnt_loss.
    """
    labels = labels.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    nll = _rnnt_nll_simple(f, g, labels, input_lengths, label_lengths)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"bad reduction {reduction}")
