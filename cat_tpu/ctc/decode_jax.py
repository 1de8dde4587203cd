"""On-device batched CTC prefix beam search (static shapes, one jit).

The TPU-native decode path promised in SURVEY.md §7 step 6: beams are
vectorized lanes, every frame does a fixed amount of work, and prefix
merging is exact via hash-sort + segmented log-sum (no host round trips,
unlike cat_tpu.ctc.decode.prefix_beam_search which mirrors ctcdecode on
the host).

Algorithm per frame (batch N, beams W, top-K expansion):
  1. candidates = W "stay" lanes (blank/repeat keep the prefix) and
     W*K "extend" lanes (append one of the frame's top-K tokens);
  2. lexicographic stable sort of the W*(K+1) lanes by 64-bit prefix
     hash (two 32-bit halves);
  3. segmented logaddexp over equal-hash runs merges duplicate prefixes
     (associative scan with reset flags — the same scatter-free trick
     as the CRF arc tables);
  4. top-W lanes by total score survive; prefix token arrays are
     gathered/appended with pure dense ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cat_tpu.ops.semiring import LOG_EPS, safe_logaddexp

_P1 = jnp.int32(1000003)
_P2 = jnp.int32(1009)


def _seg_merge(values, flags):
    """Segmented logaddexp along the last axis: runs delimited by
    flags (True = new segment). Returns per-position running total;
    the LAST position of each run holds the full merge."""

    def comb(a, b):
        av, af = a
        bv, bf = b
        v = jnp.where(bf, bv, safe_logaddexp(av, bv))
        return v, af | bf

    out, _ = jax.lax.associative_scan(comb, (values, flags), axis=-1)
    return out


@partial(jax.jit, static_argnames=("beam_width", "topk", "max_len",
                                   "blank", "beta"))
def ctc_beam_search_device(log_probs, lengths, beam_width=8, topk=8,
                           max_len=128, blank=0, beta=0.0):
    """Batched prefix beam search.

    Args:
      log_probs: (N, T, V) log-softmax outputs.
      lengths: (N,) frame counts.
      beta: per-token insertion bonus added on every prefix extension
        (ctcdecode's word bonus; negative = insertion penalty). Useful
        for CRF-trained models whose un-fused prefix posteriors favor
        oscillating insertions.
    Returns:
      prefixes: (N, W, max_len) int32 (0-padded)
      plens: (N, W)
      scores: (N, W) total log-probabilities, best-first.
    """
    N, T, V = log_probs.shape
    W, K = beam_width, min(topk, V)  # top-k can't exceed the vocab
    C = W * (K + 1)  # candidates per utterance

    pb0 = jnp.full((N, W), LOG_EPS).at[:, 0].set(0.0)
    pnb0 = jnp.full((N, W), LOG_EPS)
    pref0 = jnp.zeros((N, W, max_len), jnp.int32)
    plen0 = jnp.zeros((N, W), jnp.int32)
    h1_0 = jnp.zeros((N, W), jnp.int32).at[:, 1:].set(
        jnp.arange(1, W, dtype=jnp.int32) * 7919)  # dead lanes distinct
    h2_0 = jnp.zeros((N, W), jnp.int32).at[:, 1:].set(
        jnp.arange(1, W, dtype=jnp.int32) * 104729)
    last0 = jnp.full((N, W), -1, jnp.int32)

    def step(carry, xs):
        pb, pnb, pref, plen, h1, h2, last = carry
        y_t, t = xs                                  # y_t (N, V)
        active = t < lengths                          # (N,)
        ptot = safe_logaddexp(pb, pnb)

        top_v, top_i = jax.lax.top_k(y_t, K)          # (N, K)

        # ---- stay candidates (W lanes): blank + repeat
        y_blank = y_t[:, blank][:, None]              # (N, 1)
        y_last = jnp.take_along_axis(
            y_t, jnp.maximum(last, 0), axis=1)        # (N, W)
        stay_pb = ptot + y_blank
        stay_pnb = jnp.where(last >= 0, pnb + y_last, LOG_EPS)

        # ---- extend candidates (W*K lanes)
        v = jnp.broadcast_to(top_i[:, None, :], (N, W, K))
        sc = jnp.broadcast_to(top_v[:, None, :], (N, W, K))
        is_rep = v == last[:, :, None]
        base = jnp.where(is_rep, pb[:, :, None], ptot[:, :, None])
        ext_pnb = base + sc + beta
        ext_pnb = jnp.where(v == blank, LOG_EPS, ext_pnb)
        ext_pnb = jnp.where(plen[:, :, None] >= max_len, LOG_EPS,
                            ext_pnb)
        ext_h1 = h1[:, :, None] * _P1 + (v + 1)
        ext_h2 = h2[:, :, None] * _P2 + (v + 1)

        # ---- flatten candidates: parent id + appended token (-1 = stay)
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((N, W * K), LOG_EPS)], axis=1)
        cand_pnb = jnp.concatenate(
            [stay_pnb, ext_pnb.reshape(N, W * K)], axis=1)
        cand_h1 = jnp.concatenate([h1, ext_h1.reshape(N, W * K)], axis=1)
        cand_h2 = jnp.concatenate([h2, ext_h2.reshape(N, W * K)], axis=1)
        parent = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None],
                              (N, W)),
             jnp.broadcast_to(
                 jnp.repeat(jnp.arange(W, dtype=jnp.int32), K)[None],
                 (N, W * K))], axis=1)
        tok = jnp.concatenate(
            [jnp.full((N, W), -1, jnp.int32), v.reshape(N, W * K)],
            axis=1)

        # ---- lexicographic stable sort by (h1, h2)
        o2 = jnp.argsort(cand_h2, axis=1, stable=True)
        g = lambda x, o: jnp.take_along_axis(x, o, axis=1)
        s_h1 = g(cand_h1, o2)
        o1 = jnp.argsort(s_h1, axis=1, stable=True)
        order = g(o2, o1)
        cand_pb, cand_pnb = g(cand_pb, order), g(cand_pnb, order)
        cand_h1, cand_h2 = g(cand_h1, order), g(cand_h2, order)
        parent, tok = g(parent, order), g(tok, order)

        new_seg = jnp.concatenate(
            [jnp.ones((N, 1), bool),
             (cand_h1[:, 1:] != cand_h1[:, :-1])
             | (cand_h2[:, 1:] != cand_h2[:, :-1])], axis=1)
        m_pb = _seg_merge(cand_pb, new_seg)
        m_pnb = _seg_merge(cand_pnb, new_seg)
        # last position of each run carries the merged value
        run_end = jnp.concatenate(
            [new_seg[:, 1:], jnp.ones((N, 1), bool)], axis=1)
        total = safe_logaddexp(m_pb, m_pnb)
        total = jnp.where(run_end, total, LOG_EPS)

        # ---- top-W merged candidates
        _, sel = jax.lax.top_k(total, W)              # (N, W)
        n_pb = g(m_pb, sel)
        n_pnb = g(m_pnb, sel)
        n_h1, n_h2 = g(cand_h1, sel), g(cand_h2, sel)
        n_parent, n_tok = g(parent, sel), g(tok, sel)

        # ---- rebuild prefix arrays
        par_pref = jnp.take_along_axis(
            pref, n_parent[:, :, None], axis=1)       # (N, W, L)
        par_plen = jnp.take_along_axis(plen, n_parent, axis=1)
        par_last = jnp.take_along_axis(last, n_parent, axis=1)
        is_ext = n_tok >= 0
        pos = jnp.minimum(par_plen, max_len - 1)
        app = par_pref.at[
            jnp.arange(N)[:, None], jnp.arange(W)[None, :], pos].set(
                jnp.where(is_ext, n_tok, par_pref[
                    jnp.arange(N)[:, None], jnp.arange(W)[None, :],
                    pos]))
        n_pref = jnp.where(is_ext[:, :, None], app, par_pref)
        n_plen = par_plen + is_ext.astype(jnp.int32)
        n_last = jnp.where(is_ext, n_tok, par_last)

        # inactive frames: keep previous state
        keep = active[:, None]
        out = (jnp.where(keep, n_pb, pb),
               jnp.where(keep, n_pnb, pnb),
               jnp.where(keep[:, :, None], n_pref, pref),
               jnp.where(keep, n_plen, plen),
               jnp.where(keep, n_h1, h1),
               jnp.where(keep, n_h2, h2),
               jnp.where(keep, n_last, last))
        return out, None

    y = jnp.transpose(log_probs, (1, 0, 2))
    (pb, pnb, pref, plen, h1, h2, last), _ = jax.lax.scan(
        step, (pb0, pnb0, pref0, plen0, h1_0, h2_0, last0),
        (y, jnp.arange(T)))
    total = safe_logaddexp(pb, pnb)
    order = jnp.argsort(-total, axis=1)
    g = lambda x, o: jnp.take_along_axis(x, o, axis=1)
    return (jnp.take_along_axis(pref, order[:, :, None], axis=1),
            g(plen, order), g(total, order))
