"""RNN-Transducer loss as a log-semiring scan.

TPU-native replacement for the external warp_rnnt CUDA dependency used by
the reference (/root/reference/cat/rnnt/train.py:206-221). Instead of the
CUDA per-(n,u) thread DP, we:

- scan over time t with `lax.scan`;
- solve each row alpha[t, :] (a first-order linear recurrence in the log
  semiring: a[u] = logaddexp(base[u], a[u-1] + emit[u-1])) with
  `jax.lax.associative_scan`, giving O(log U) depth per frame and full
  (N, U) vectorization on the VPU;
- compute exact gradients with a custom VJP from an alpha + beta pass
  (no differentiation through the scans).

Variable (T_n, U_n) are handled branch-free: padded frames emit blank for
free, labels beyond U_n are impossible, so all mass rides the u = U_n row
to T_max and the likelihood is read at a single static location.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.semiring import LOG_EPS, safe_logaddexp


def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _log_linrec(m, base):
    """Solve a[u] = logaddexp(base[u], m[u] + a[u-1]) along the last axis.

    m[0] must be LOG_EPS (no predecessor). Uses associative_scan over
    (log-multiplier, log-addend) pairs in the (+, *) semiring, log domain.
    """

    def combine(x, y):
        xm, xa = x
        ym, ya = y
        return (jnp.maximum(xm + ym, LOG_EPS),
                safe_logaddexp(ya, jnp.maximum(ym + xa, LOG_EPS)))

    _, a = jax.lax.associative_scan(combine, (m, base), axis=-1)
    return a


def _row_tables(log_probs, labels, input_lengths, label_lengths, blank):
    """Gather blank/label transition log-probs with padding semantics.

    Returns (blank_eff, label_eff, blank_raw) each (T, N, U+1):
      blank_eff: 0 at padded frames (free ride), else lp[t,u,blank]
      label_eff: LOG_EPS for u >= U_n or padded frames, else lp[t,u,y_{u+1}]
    """
    N, T, U1, V = log_probs.shape
    blank_raw = log_probs[..., blank]  # (N, T, U1)
    lab_idx = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.zeros((N, 1), jnp.int32)], axis=1)  # (N, U1); last col unused
    label_raw = jnp.take_along_axis(
        log_probs, lab_idx[:, None, :, None], axis=3)[..., 0]  # (N, T, U1)

    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    frame_valid = t_idx < input_lengths[:, None, None]
    u_valid = u_idx < label_lengths[:, None, None]

    blank_eff = jnp.where(frame_valid, blank_raw, 0.0)
    label_eff = jnp.where(frame_valid & u_valid, label_raw, LOG_EPS)
    # (T, N, U1) layout for scanning
    tr = lambda x: jnp.transpose(x, (1, 0, 2))
    return tr(blank_eff), tr(label_eff), tr(blank_raw), tr(label_raw)


def _use_pallas():
    """Opt-in fused Pallas kernels for the lattice scans (config key
    perf.rnnt_impl = "pallas", env override CAT_TPU_RNNT_IMPL; TPU only
    — interpret mode elsewhere is for testing, not speed)."""
    from cat_tpu.utils.flags import flag, on_tpu

    v = flag("rnnt_impl")
    if v == "auto":
        return on_tpu()
    return v == "pallas"


def _forward_alphas(blank_eff, label_eff):
    if _use_pallas():
        from cat_tpu.ops.rnnt_pallas import forward_alphas_pallas

        return forward_alphas_pallas(
            blank_eff, label_eff,
            interpret=jax.default_backend() != "tpu")
    T, N, U1 = blank_eff.shape
    alpha0 = jnp.full((N, U1), LOG_EPS).at[:, 0].set(0.0)
    # base for row t uses blank transitions of row t-1; row 0 uses zeros so
    # base == alpha0.
    blank_prev = jnp.concatenate(
        [jnp.zeros((1, N, U1)), blank_eff[:-1]], axis=0)

    def step(alpha, xs):
        b_prev, lab_cur = xs
        base = jnp.maximum(alpha + b_prev, LOG_EPS)
        # multiplier m[u] = label_eff[t, u-1]
        m = jnp.concatenate(
            [jnp.full((N, 1), LOG_EPS), lab_cur[:, :-1]], axis=1)
        row = _log_linrec(m, base)
        row = jnp.maximum(row, LOG_EPS)
        return row, row

    _, alphas = jax.lax.scan(step, alpha0, (blank_prev, label_eff))
    return alphas  # (T, N, U1)


def _backward_betas(blank_eff, label_eff, label_lengths):
    T, N, U1 = blank_eff.shape
    u_idx = jnp.arange(U1)
    beta_term = jnp.where(u_idx[None, :] == label_lengths[:, None],
                          0.0, LOG_EPS)  # beta[T]
    if _use_pallas():
        from cat_tpu.ops.rnnt_pallas import backward_betas_pallas

        betas = backward_betas_pallas(
            blank_eff, label_eff, beta_term,
            interpret=jax.default_backend() != "tpu")
        return betas, beta_term

    def step(beta_next, xs):
        b_cur, lab_cur = xs
        base = jnp.maximum(b_cur + beta_next, LOG_EPS)
        # beta[t,u] = logaddexp(base[u], lab_cur[u] + beta[t,u+1])
        # flip u: a[k] = logaddexp(base_f[k], m_f[k] + a[k-1]),
        # m_f[k] = lab_cur_f[k] for k>=1
        base_f = base[:, ::-1]
        lab_f = lab_cur[:, ::-1]
        m = jnp.concatenate([jnp.full((N, 1), LOG_EPS), lab_f[:, 1:]],
                            axis=1)
        row_f = _log_linrec(m, base_f)
        row = jnp.maximum(row_f[:, ::-1], LOG_EPS)
        return row, row

    _, betas = jax.lax.scan(step, beta_term, (blank_eff, label_eff),
                            reverse=True)
    return betas, beta_term  # betas[t] = beta at row t; (T, N, U1)


def _rnnt_nll_impl(log_probs, labels, input_lengths, label_lengths, blank):
    blank_eff, label_eff, blank_raw, label_raw = _row_tables(
        log_probs, labels, input_lengths, label_lengths, blank)
    alphas = _forward_alphas(blank_eff, label_eff)
    N = log_probs.shape[0]
    n_idx = jnp.arange(N)
    ll = (alphas[-1][n_idx, label_lengths]
          + blank_eff[-1][n_idx, label_lengths])
    return -ll, (blank_eff, label_eff, blank_raw, label_raw, alphas, ll)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rnnt_nll(log_probs, labels, input_lengths, label_lengths, blank):
    nll, _ = _rnnt_nll_impl(log_probs, labels, input_lengths, label_lengths,
                            int(blank))
    return nll


def _rnnt_nll_fwd(log_probs, labels, input_lengths, label_lengths, blank):
    nll, res = _rnnt_nll_impl(log_probs, labels, input_lengths,
                              label_lengths, int(blank))
    blank_eff, label_eff, blank_raw, label_raw, alphas, ll = res
    return nll, (log_probs.shape, blank_eff, label_eff, blank_raw,
                 label_raw, alphas, ll, labels, input_lengths, label_lengths)


def _rnnt_nll_bwd(blank, res, g):
    (lp_shape, blank_eff, label_eff, blank_raw, label_raw, alphas, ll,
     labels, input_lengths, label_lengths) = res
    N, T, U1, V = lp_shape

    betas, beta_term = _backward_betas(blank_eff, label_eff, label_lengths)
    betas_next = jnp.concatenate([betas[1:], beta_term[None]], axis=0)

    ll_safe = jnp.where(ll <= LOG_EPS / 2, 0.0, ll)[None, :, None]
    t_idx = jnp.arange(T)[:, None, None]
    u_idx = jnp.arange(U1)[None, None, :]
    frame_valid = t_idx < input_lengths[None, :, None]  # (T, N, 1)
    u_valid_b = u_idx <= label_lengths[None, :, None]
    u_valid_l = u_idx < label_lengths[None, :, None]

    sb = alphas + blank_raw + betas_next - ll_safe
    pos_blank = jnp.where(
        frame_valid & u_valid_b & (sb > LOG_EPS / 2), jnp.exp(sb), 0.0)
    beta_up = jnp.concatenate(
        [betas[:, :, 1:], jnp.full((T, N, 1), LOG_EPS)], axis=2)
    sl = alphas + label_raw + beta_up - ll_safe
    pos_label = jnp.where(
        frame_valid & u_valid_l & (sl > LOG_EPS / 2), jnp.exp(sl), 0.0)

    # scatter into (N, T, U1, V)
    gw = g[None, :, None]
    pos_blank = jnp.transpose(pos_blank * gw, (1, 0, 2))  # (N, T, U1)
    pos_label = jnp.transpose(pos_label * gw, (1, 0, 2))

    onehot_blank = jax.nn.one_hot(jnp.array(blank), V)  # (V,)
    lab_idx = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)], axis=1)
    onehot_lab = jax.nn.one_hot(lab_idx, V)  # (N, U1, V)

    grad = -(pos_blank[..., None] * onehot_blank[None, None, None, :]
             + pos_label[..., None] * onehot_lab[:, None, :, :])
    return (grad, _float0_zeros(labels), _float0_zeros(input_lengths),
            _float0_zeros(label_lengths))


_rnnt_nll.defvjp(_rnnt_nll_fwd, _rnnt_nll_bwd)


def rnnt_loss(log_probs, labels, input_lengths, label_lengths, blank=0,
              reduction="mean"):
    """RNN-T negative log-likelihood.

    Args:
      log_probs: (N, T, U+1, V) joiner outputs after log_softmax.
      labels: (N, U) int labels (0-padded).
      input_lengths: (N,) encoder frame counts.
      label_lengths: (N,) label counts.
      blank: blank index (default 0).
      reduction: 'none' | 'sum' | 'mean'.
    """
    labels = labels.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    nll = _rnnt_nll(log_probs, labels, input_lengths, label_lengths, blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"bad reduction {reduction}")
