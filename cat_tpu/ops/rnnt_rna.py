"""Monotonic (RNA / CTC-topology) transducer loss.

Counterpart of the reference's warp_ctct external dependency
(requirements.txt:7-10, used via topo='ctct' in
/root/reference/cat/rnnt/train.py:24-30,210): a transducer where EVERY
emission (label or blank) consumes exactly one encoder frame — the
monotonic "recurrent neural aligner" lattice, which is also what the
frame-synchronous beam search assumes.

Recursion (alpha over (t, u)):
  alpha[t+1, u]   ⊕= alpha[t, u]   + lp[t, u, blank]
  alpha[t+1, u+1] ⊕= alpha[t, u]   + lp[t, u, y_{u+1}]
  ll = alpha[T, U]

Row updates depend only on the previous row (no in-row recurrence), so
the scan body is two shifted adds + logaddexp — cheaper than full RNN-T.
Gradients via jax autodiff through the scan (exact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cat_tpu.ops.semiring import LOG_EPS, safe_logaddexp


def rnnt_loss_rna(log_probs, labels, input_lengths, label_lengths,
                  blank=0, reduction="mean"):
    """Monotonic transducer NLL.

    Args:
      log_probs: (N, T, U+1, V) joiner log-softmax outputs.
      labels: (N, U); input_lengths, label_lengths: (N,).
    Requires T_n >= U_n (one frame per label).
    """
    labels = labels.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    N, T, U1, V = log_probs.shape

    blank_raw = log_probs[..., blank]                      # (N, T, U1)
    lab_idx = jnp.concatenate(
        [labels, jnp.zeros((N, 1), jnp.int32)], axis=1)    # (N, U1)
    label_raw = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(
            lab_idx[:, None, :, None], (N, T, U1, 1)), axis=3)[..., 0]

    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    frame_valid = t_idx < input_lengths[:, None, None]
    u_valid = u_idx < label_lengths[:, None, None]
    blank_eff = jnp.where(frame_valid, blank_raw, 0.0)
    label_eff = jnp.where(frame_valid & u_valid, label_raw, LOG_EPS)
    tr = lambda x: jnp.transpose(x, (1, 0, 2))             # (T, N, U1)
    blank_eff, label_eff = tr(blank_eff), tr(label_eff)

    alpha0 = jnp.full((N, U1), LOG_EPS).at[:, 0].set(0.0)

    def step(alpha, xs):
        b_t, l_t = xs
        stay = alpha + b_t
        adv = jnp.concatenate(
            [jnp.full((N, 1), LOG_EPS), (alpha + l_t)[:, :-1]], axis=1)
        nxt = jnp.maximum(safe_logaddexp(stay, adv), LOG_EPS)
        return nxt, None

    alpha_T, _ = jax.lax.scan(step, alpha0, (blank_eff, label_eff))
    ll = alpha_T[jnp.arange(N), label_lengths]
    nll = -ll
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    raise ValueError(f"bad reduction {reduction}")
