"""CTC decoding: batched greedy + prefix beam search with n-gram fusion.

Replaces the reference's ctcdecode C++ extension (batched prefix beam
search + KenLM fusion, used in /root/reference/cat/ctc/decode.py:163-210)
and the greedy path. The encoder forward runs jitted on device; the beam
search here is the host reference implementation (exact prefix-merging
semantics); a static-shape on-device variant lives in
cat_tpu/ctc/decode_jax.py.
"""
from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _lae(a, b):
    if a <= NEG_INF / 2:
        return b
    if b <= NEG_INF / 2:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def greedy_decode(log_probs, lengths, blank=0):
    """(N, T, V) log-probs → list[list[int]] (collapse repeats, drop
    blank)."""
    path = np.asarray(jnp.argmax(log_probs, axis=-1))
    lengths = np.asarray(lengths)
    out = []
    for n in range(path.shape[0]):
        seq, prev = [], -1
        for s in path[n, : lengths[n]]:
            if s != prev and s != blank:
                seq.append(int(s))
            prev = int(s)
        out.append(seq)
    return out


def prefix_beam_search(log_probs, length, beam_width=16, blank=0,
                       lm=None, alpha=0.0, beta=0.0, lm_sym=None,
                       nbest=1):
    """Prefix beam search for ONE utterance.

    log_probs: (T, V) numpy log-softmax. Optional n-gram fusion:
    lm: cat_tpu.fst.ngram.NGramLM scoring token ids (or via lm_sym
    mapping id→symbol); score += alpha·log10 p_lm + beta per word
    (the KenLM fusion semantics of ctcdecode).

    Returns list of (score, prefix tuple) sorted best-first.
    """
    lp = np.asarray(log_probs)[:int(length)]
    T, V = lp.shape
    LN10 = math.log(10.0)

    def lm_score(prefix, tok):
        if lm is None:
            return 0.0
        ctx = tuple(lm_sym(t) if lm_sym else t for t in prefix)
        w = lm_sym(tok) if lm_sym else tok
        return alpha * lm.logp(ctx, w) * LN10 + beta

    # beams: prefix -> (p_blank, p_nonblank, lm_total)
    beams = {(): (0.0, NEG_INF, 0.0)}
    for t in range(T):
        row = lp[t]
        # prune vocab: consider top candidates + blank
        cand = np.argsort(row)[::-1][: max(beam_width * 2, 8)]
        if blank not in cand:
            cand = np.append(cand, blank)
        new = defaultdict(lambda: [NEG_INF, NEG_INF, 0.0])

        for prefix, (pb, pnb, lms) in beams.items():
            p_tot = _lae(pb, pnb)
            for v in cand:
                p = float(row[v])
                if v == blank:
                    e = new[prefix]
                    e[0] = _lae(e[0], p_tot + p)
                    e[2] = lms
                    continue
                last = prefix[-1] if prefix else None
                if v == last:
                    # repeat: extends non-blank stays same prefix
                    e = new[prefix]
                    e[1] = _lae(e[1], pnb + p)
                    e[2] = lms
                    # with blank in between: new prefix
                    np_prefix = prefix + (int(v),)
                    s = lm_score(prefix, int(v))
                    e2 = new[np_prefix]
                    e2[1] = _lae(e2[1], pb + p)
                    e2[2] = lms + s
                else:
                    np_prefix = prefix + (int(v),)
                    s = lm_score(prefix, int(v))
                    e2 = new[np_prefix]
                    e2[1] = _lae(e2[1], p_tot + p)
                    e2[2] = lms + s
        # prune to beam_width by total score incl. LM
        scored = []
        for prefix, (pb, pnb, lms) in new.items():
            scored.append((_lae(pb, pnb) + lms, prefix, (pb, pnb, lms)))
        scored.sort(key=lambda x: -x[0])
        beams = {p: st for _, p, st in scored[:beam_width]}

    final = [(_lae(pb, pnb) + lms, prefix)
             for prefix, (pb, pnb, lms) in beams.items()]
    final.sort(key=lambda x: -x[0])
    return final[:nbest]


def batch_prefix_beam_search(log_probs, lengths, **kw):
    """Loop wrapper over the batch; returns list of nbest lists."""
    out = []
    for n in range(np.shape(log_probs)[0]):
        out.append(prefix_beam_search(np.asarray(log_probs)[n],
                                      int(np.asarray(lengths)[n]), **kw))
    return out
