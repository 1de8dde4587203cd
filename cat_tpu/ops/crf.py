"""CTC-CRF loss: numerator CTC + denominator WFST log-partition.

TPU-native replacement for the reference's gpu_den CUDA kernels
(/root/reference/src/ctc_crf/gpu_den/den_calculate.cu — per-frame
kernel-launch alpha loop at :427-451, atomic-CAS beta/grad accumulation at
:189-253) and the _CTC_CRF autograd wrapper
(/root/reference/src/ctc_crf/ctc_crf/__init__.py:58-94:
cost = den_lld − (1+λ)·ctc_lld).

Design:
- The denominator graph is a flattened arc table (DenGraph) living on
  device; one `lax.scan` over frames computes all alphas; each step is a
  gather (alpha[src] + w + y[t, label]) followed by a deterministic
  segment-logsumexp into the destination states — no atomics, bitwise
  reproducible.
- The backward pass is a reverse scan that carries beta and emits the
  per-frame gradient row directly (arc posteriors scattered into the
  vocabulary axis by segment-sum), so betas are never materialized.
- Variable lengths freeze alpha/beta at padded frames (branch-free where).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.ops.semiring import LOG_EPS


def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _seg_logsumexp_batched(scores, seg_ids, num_segments):
    """scores (N, A) → (N, Q): logsumexp of arcs grouped by seg_ids.

    Two-pass (segment_max then segment_sum of exp) along the arc axis,
    vmapped over the batch. Deterministic."""

    def one(row):
        mx = jax.ops.segment_max(row, seg_ids, num_segments=num_segments)
        mx = jnp.maximum(mx, LOG_EPS)
        s = jax.ops.segment_sum(jnp.exp(row - mx[seg_ids]), seg_ids,
                                num_segments=num_segments)
        out = mx + jnp.log(jnp.maximum(s, 1e-37))
        return jnp.where(s <= 0.0, LOG_EPS, out)

    return jax.vmap(one)(scores)


class DenDevice:
    """Device-resident denominator graph arrays (see fst.graph.DenGraph).

    Pytree-compatible container so it can close over jitted functions.
    Equivalent role to the reference's CRFContext which preloads the den
    LM per GPU (ctc_crf/__init__.py:147-171)."""

    def __init__(self, src, dst, label, weight, start_w, final_w,
                 num_states):
        self.src = jnp.asarray(src, jnp.int32)
        self.dst = jnp.asarray(dst, jnp.int32)
        self.label = jnp.asarray(label, jnp.int32)
        self.weight = jnp.asarray(weight, jnp.float32)
        self.start_w = jnp.asarray(start_w, jnp.float32)
        self.final_w = jnp.asarray(final_w, jnp.float32)
        self.num_states = int(num_states)

    @classmethod
    def from_graph(cls, g):
        return cls(g.arc_src, g.arc_dst, g.arc_label, g.arc_weight,
                   g.start_weights, g.final_weights, g.num_states)


def _den_forward(log_probs, input_lengths, src, dst, label, weight,
                 start_w, final_w, num_states):
    """All alphas (T, N, Q) + logZ (N,)."""
    N, T, V = log_probs.shape
    y = jnp.transpose(log_probs, (1, 0, 2))  # (T, N, V)
    alpha0 = jnp.broadcast_to(start_w, (N, num_states))

    def step(carry, xs):
        alpha = carry
        y_t, t = xs
        em = y_t[:, label]                      # (N, A)
        scores = alpha[:, src] + weight[None, :] + em
        nxt = _seg_logsumexp_batched(scores, dst, num_states)
        nxt = jnp.maximum(nxt, LOG_EPS)
        keep = (t < input_lengths)[:, None]
        nxt = jnp.where(keep, nxt, alpha)
        return nxt, alpha  # emit alpha BEFORE consuming frame t

    t_idx = jnp.arange(T)
    alpha_last, alphas = jax.lax.scan(step, alpha0, (y, t_idx))
    # alphas[t] = alpha before frame t; alpha_last = after all frames
    logz = jax.nn.logsumexp(
        jnp.where(final_w[None, :] <= LOG_EPS / 2, -jnp.inf,
                  alpha_last + final_w[None, :]), axis=1)
    return alphas, alpha_last, logz


def _den_impl(log_probs, input_lengths, den: DenDevice):
    alphas, alpha_last, logz = _den_forward(
        log_probs, input_lengths, den.src, den.dst, den.label, den.weight,
        den.start_w, den.final_w, den.num_states)
    return logz, (alphas, logz)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def den_log_partition(log_probs, input_lengths, den):
    """log Z(x): denominator WFST log-partition per utterance.

    Args:
      log_probs: (N, T, V) frame scores (typically log-softmax outputs).
      input_lengths: (N,) frame counts.
      den: DenDevice graph.
    Returns: (N,) log-partition values.
    """
    logz, _ = _den_impl(log_probs, input_lengths, den)
    return logz


def _den_fwd(log_probs, input_lengths, den):
    logz, res = _den_impl(log_probs, input_lengths, den)
    alphas, _ = res
    return logz, (log_probs, input_lengths, alphas, logz)


def _den_bwd(den, res, g):
    log_probs, input_lengths, alphas, logz = res
    N, T, V = log_probs.shape
    y = jnp.transpose(log_probs, (1, 0, 2))  # (T, N, V)
    num_states = den.num_states

    def scatter_grad(xi, labels_seg):
        def one(row):
            return jax.ops.segment_sum(row, labels_seg, num_segments=V)
        return jax.vmap(one)(xi)

    def step(carry, xs):
        beta = carry  # beta after frames > t, shape (N, Q)
        y_t, alpha_t, t = xs
        em = y_t[:, den.label]                           # (N, A)
        arc_rhs = den.weight[None, :] + em + beta[:, den.dst]
        # beta before frame t
        beta_prev = _seg_logsumexp_batched(
            # group by src: logsumexp over outgoing arcs
            arc_rhs, den.src, num_states)
        beta_prev = jnp.maximum(beta_prev, LOG_EPS)
        active = (t < input_lengths)[:, None]
        beta_out = jnp.where(active, beta_prev, beta)
        # arc posterior for frame t (only when active)
        xi = alpha_t[:, den.src] + arc_rhs - logz[:, None]
        xi = jnp.where(xi <= LOG_EPS / 2, 0.0, jnp.exp(xi))
        xi = jnp.where(active, xi, 0.0)
        grad_row = scatter_grad(xi, den.label)           # (N, V)
        return beta_out, grad_row

    t_idx = jnp.arange(T)
    beta_T = jnp.broadcast_to(den.final_w, (N, num_states))
    _, grad_rows = jax.lax.scan(step, beta_T, (y, alphas, t_idx),
                                reverse=True)
    grad = jnp.transpose(grad_rows, (1, 0, 2)) * g[:, None, None]
    return (grad, _float0_zeros(input_lengths))


den_log_partition.defvjp(_den_fwd, _den_bwd)


def ctc_crf_loss(log_probs, labels, input_lengths, label_lengths, den,
                 lamb=0.1, blank=0, reduction="mean"):
    """CTC-CRF (lattice-free MMI) loss with CTC regularization.

    cost = den_lld − (1+λ)·ctc_lld, batch-reduced — exactly the combination
    of the reference's _CTC_CRF.forward (ctc_crf/__init__.py:81-83).
    """
    nll_ctc = ctc_loss(log_probs, labels, input_lengths, label_lengths,
                       blank=blank, reduction="none")
    logz = den_log_partition(log_probs, input_lengths, den)
    per_seq = logz + (1.0 + lamb) * nll_ctc
    if reduction == "none":
        return per_seq
    if reduction == "sum":
        return jnp.sum(per_seq)
    if reduction == "mean":
        return jnp.mean(per_seq)
    raise ValueError(f"bad reduction {reduction}")
