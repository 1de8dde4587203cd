"""CTC forced alignment: Viterbi best path through the label lattice.

Counterpart of the reference's external `ctc-align` dependency
(requirements.txt:7-10): given log-probs and a transcript, find the
max-probability frame-level alignment (which token, incl. blank, each
frame emits) — used for segmentation and analysis.

Same lattice construction as ops/ctc.py but in the tropical (max)
semiring with backpointers, fully jittable (scan + backtrace scan).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cat_tpu.ops.ctc import _emissions, _lattice_tables
from cat_tpu.ops.semiring import LOG_EPS


def ctc_forced_align(log_probs, labels, input_lengths, label_lengths,
                     blank=0):
    """Viterbi alignment.

    Args:
      log_probs: (N, T, V) log-softmax outputs.
      labels: (N, U); input_lengths/label_lengths: (N,).
    Returns:
      frame_labels: (N, T) int32 — emitted symbol per frame (blank or
        label id); frames beyond input_lengths are blank.
      scores: (N,) best-path log-probabilities.
    """
    labels = labels.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    N, T, V = log_probs.shape
    S = 2 * labels.shape[1] + 1
    ext, svalid, allow2 = _lattice_tables(labels, label_lengths, blank, S)
    em = _emissions(log_probs, ext, svalid, input_lengths, blank)

    alpha0 = jnp.full((N, S), LOG_EPS).at[:, 0].set(0.0)

    def shift_right(x, k):
        pad = jnp.full(x.shape[:-1] + (k,), LOG_EPS, x.dtype)
        return jnp.concatenate([pad, x[..., :-k]], axis=-1)

    def step(alpha, em_t):
        a0 = alpha
        a1 = shift_right(alpha, 1)
        a2 = jnp.where(allow2, shift_right(alpha, 2), LOG_EPS)
        stacked = jnp.stack([a0, a1, a2], axis=0)       # (3, N, S)
        best = jnp.max(stacked, axis=0)
        arg = jnp.argmax(stacked, axis=0).astype(jnp.int32)  # 0/1/2 back
        nxt = jnp.maximum(em_t + best, LOG_EPS)
        return nxt, (nxt, arg)

    alpha_last, (alphas, bps) = jax.lax.scan(step, alpha0, em)

    # final state: argmax over {S_n-1, S_n-2}
    n_idx = jnp.arange(N)
    idx1 = 2 * label_lengths
    idx2 = jnp.maximum(idx1 - 1, 0)
    a1 = alpha_last[n_idx, idx1]
    a2 = jnp.where(idx1 >= 1, alpha_last[n_idx, idx2], LOG_EPS)
    final_s = jnp.where(a1 >= a2, idx1, idx2).astype(jnp.int32)
    scores = jnp.maximum(a1, a2)

    # backtrace (reverse scan over stored backpointers)
    def back(carry, xs):
        s = carry                       # (N,) current state at frame t
        bp_t, t = xs                    # bp for transition INTO frame t
        # emitted symbol at frame t is ext[s] (when t < T_n)
        sym = jnp.take_along_axis(ext, s[:, None], axis=1)[:, 0]
        sym = jnp.where(t < input_lengths, sym, blank)
        delta = jnp.take_along_axis(bp_t, s[:, None], axis=1)[:, 0]
        # padded frames have valid backpointers too (blank-only states);
        # backtrace through them so the state chain stays consistent
        prev_s = jnp.maximum(s - delta, 0)
        return prev_s.astype(jnp.int32), sym

    t_idx = jnp.arange(T)
    _, syms = jax.lax.scan(back, final_s, (bps, t_idx), reverse=True)
    frame_labels = jnp.transpose(syms, (1, 0))          # (N, T)
    return frame_labels, scores
