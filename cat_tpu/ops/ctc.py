"""CTC loss as a log-semiring scan over the blank-interleaved label lattice.

TPU-native replacement for the reference's warp-ctc fork
(/root/reference/src/ctc_crf/gpu_ctc/gpu_ctc_kernels.h — alpha/beta CTA
kernels) and its autograd wrapper WARP_CTC_LOSS
(/root/reference/src/ctc_crf/ctc_crf/__init__.py:97-136).

Design (TPU-first, not a translation):
- One `lax.scan` over time; each step is a dense (N, S) vectorized update on
  the VPU — no per-utterance tiling heuristics, no CTA primitives.
- Variable lengths are handled branch-free by a padding construction: padded
  frames emit blank with log-prob 0 and everything else with LOG_EPS, which
  provably transports all path mass into the final blank state with zero
  extra cost, so the scan runs a single static T for the whole batch.
- Custom VJP computes the exact posterior gradient from an alpha + beta pass
  (grad wrt log_probs = -gamma), avoiding differentiating through the scan.

Labels use blank=0 by convention (same as the reference toolkit).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.semiring import LOG_EPS, logaddexp3, safe_logaddexp


def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _shift_right(x, k):
    """x[..., s-k] with LOG_EPS fill (along last axis)."""
    pad = jnp.full(x.shape[:-1] + (k,), LOG_EPS, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _shift_left(x, k):
    pad = jnp.full(x.shape[:-1] + (k,), LOG_EPS, x.dtype)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def _lattice_tables(labels, label_lengths, blank, S):
    """Extended-label table and transition masks for the CTC lattice.

    Returns:
      ext: (N, S) int32 — ext[2i] = blank, ext[2i+1] = labels[i]
      svalid: (N, S) bool — state index < 2*U_n + 1
      allow2: (N, S) bool — skip transition s-2 -> s permitted
    """
    N, U = labels.shape
    s_idx = jnp.arange(S)
    ext = jnp.full((N, S), blank, jnp.int32)
    ext = ext.at[:, 1::2].set(labels.astype(jnp.int32))
    svalid = s_idx[None, :] < (2 * label_lengths[:, None] + 1)
    is_odd = (s_idx % 2 == 1) & (s_idx >= 3)
    prev2 = jnp.roll(ext, 2, axis=1)
    allow2 = is_odd[None, :] & (ext != prev2)
    return ext, svalid, allow2


def _emissions(log_probs, ext, svalid, input_lengths, blank):
    """Per-state emission table em (T, N, S), padding-aware.

    For t >= T_n, blank states emit 0.0 (free) and label states LOG_EPS:
    all surviving mass is forced into the final blank state by T_max with
    no added cost, so a single static-length scan is exact.
    """
    N, T, V = log_probs.shape
    S = ext.shape[1]
    em = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)  # (N,T,S)
    s_idx = jnp.arange(S)
    is_blank_state = (ext == blank)  # (N, S) — even states, plus odd==blank
    pad_em = jnp.where(is_blank_state[:, None, :], 0.0, LOG_EPS)
    t_idx = jnp.arange(T)
    frame_valid = t_idx[None, :, None] < input_lengths[:, None, None]
    em = jnp.where(frame_valid, em, pad_em)
    em = jnp.where(svalid[:, None, :], em, LOG_EPS)
    del s_idx
    return jnp.transpose(em, (1, 0, 2))  # (T, N, S)


def _use_pallas():
    """Opt-in fused Pallas kernels for the lattice scans (config key
    perf.ctc_impl = "pallas", env override CAT_TPU_CTC_IMPL; TPU only —
    interpret mode elsewhere is for testing, not speed)."""
    from cat_tpu.utils.flags import flag, on_tpu

    v = flag("ctc_impl")
    if v == "auto":
        return on_tpu()
    return v == "pallas"


def _forward_alphas(em, allow2):
    """All alpha rows (T, N, S) via one scan."""
    if _use_pallas():
        from cat_tpu.ops.ctc_pallas import forward_alphas_pallas

        return forward_alphas_pallas(
            em, allow2, interpret=jax.default_backend() != "tpu")
    T, N, S = em.shape
    alpha0 = jnp.full((N, S), LOG_EPS, em.dtype).at[:, 0].set(0.0)

    def step(alpha, em_t):
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(allow2, _shift_right(alpha, 2), LOG_EPS)
        nxt = em_t + logaddexp3(alpha, a1, a2)
        nxt = jnp.maximum(nxt, LOG_EPS)
        return nxt, nxt

    _, alphas = jax.lax.scan(step, alpha0, em)
    return alphas


def _final_ll(alpha_last, label_lengths):
    N = alpha_last.shape[0]
    idx1 = 2 * label_lengths  # S_n - 1 (final blank)
    idx2 = idx1 - 1           # last label state
    n_idx = jnp.arange(N)
    a1 = alpha_last[n_idx, idx1]
    a2 = jnp.where(idx2 >= 0, alpha_last[n_idx, jnp.maximum(idx2, 0)],
                   LOG_EPS)
    return safe_logaddexp(a1, a2)


def _ctc_nll_impl(log_probs, labels, input_lengths, label_lengths, blank):
    S = 2 * labels.shape[1] + 1
    ext, svalid, allow2 = _lattice_tables(labels, label_lengths, blank, S)
    em = _emissions(log_probs, ext, svalid, input_lengths, blank)
    alphas = _forward_alphas(em, allow2)
    ll = _final_ll(alphas[-1], label_lengths)
    return -ll, (ext, svalid, allow2, em, alphas, ll)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_nll(log_probs, labels, input_lengths, label_lengths, blank):
    nll, _ = _ctc_nll_impl(log_probs, labels, input_lengths, label_lengths,
                           int(blank))
    return nll


def _ctc_nll_fwd(log_probs, labels, input_lengths, label_lengths, blank):
    nll, res = _ctc_nll_impl(log_probs, labels, input_lengths, label_lengths,
                             int(blank))
    ext, svalid, allow2, em, alphas, ll = res
    return nll, (log_probs.shape, ext, allow2, em, alphas, ll,
                 input_lengths, label_lengths, labels)


def _ctc_nll_bwd(blank, res, g):
    (lp_shape, ext, allow2, em, alphas, ll, input_lengths, label_lengths,
     labels) = res
    N, T, V = lp_shape
    S = ext.shape[1]

    # beta-hat reverse scan: beta[T-1] = 0 on final states.
    idx1 = 2 * label_lengths
    idx2 = idx1 - 1
    s_idx = jnp.arange(S)
    beta_last = jnp.where(
        (s_idx[None, :] == idx1[:, None])
        | ((s_idx[None, :] == idx2[:, None]) & (idx2 >= 0)[:, None]),
        0.0, LOG_EPS)
    allow2_dst = _shift_left(jnp.where(allow2, 0.0, LOG_EPS), 2) == 0.0

    if _use_pallas():
        from cat_tpu.ops.ctc_pallas import backward_betas_pallas

        betas = backward_betas_pallas(
            em, allow2_dst, beta_last,
            interpret=jax.default_backend() != "tpu")
    else:
        def stepb(beta, em_next_t):
            b = jnp.maximum(em_next_t + beta, LOG_EPS)
            b1 = _shift_left(b, 1)
            b2 = jnp.where(allow2_dst, _shift_left(b, 2), LOG_EPS)
            prv = logaddexp3(b, b1, b2)
            prv = jnp.maximum(prv, LOG_EPS)
            return prv, prv

        # betas[t] for t in [0, T-2] in reverse, plus beta_last.
        _, betas_head = jax.lax.scan(stepb, beta_last, em[1:],
                                     reverse=True)
        betas = jnp.concatenate([betas_head, beta_last[None]], axis=0)

    score = alphas + betas - jnp.where(
        ll[None, :, None] <= LOG_EPS / 2, 0.0, ll[None, :, None])
    gamma = jnp.where(score <= LOG_EPS / 2, 0.0, jnp.exp(score))  # (T,N,S)

    t_idx = jnp.arange(T)
    frame_valid = (t_idx[:, None] < input_lengths[None, :])  # (T, N)
    gamma = jnp.where(frame_valid[:, :, None], gamma, 0.0)

    onehot = jax.nn.one_hot(ext, V, dtype=gamma.dtype)  # (N, S, V)
    # d(-ll)/d log_probs[n,t,v] = -sum_{s: ext=v} gamma[t,n,s]
    grad = -jnp.einsum("tns,nsv->ntv", gamma * g[None, :, None], onehot)
    return (grad, _float0_zeros(labels), _float0_zeros(input_lengths),
            _float0_zeros(label_lengths))


_ctc_nll.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss(log_probs, labels, input_lengths, label_lengths, blank=0,
             reduction="mean"):
    """CTC negative log-likelihood.

    Args:
      log_probs: (N, T, V) log-softmax outputs, batch-first.
      labels: (N, U) int labels, 0-padded; blank must not appear as a label.
      input_lengths: (N,) int frame counts.
      label_lengths: (N,) int label counts.
      blank: blank index (default 0, toolkit convention).
      reduction: 'none' | 'sum' | 'mean' (mean over batch, matching the
        reference's size_average batch averaging in _CTC semantics).

    Returns: scalar loss (or (N,) if reduction='none').
    """
    labels = labels.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    nll = _ctc_nll(log_probs, labels, input_lengths, label_lengths, blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"bad reduction {reduction}")
