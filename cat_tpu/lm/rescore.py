"""N-best rescoring: score = am + α·lm + β·len.

Counterpart of /root/reference/cat/lm/rescore.py:145-200 and the
lmweight grid search (cat/utils/lmweight_search.py). Works with neural
LMs (sentence_nll) or n-gram LMs (fst.ngram.NGramLM).
"""
from __future__ import annotations

import math

import numpy as np

LN10 = math.log(10.0)


def rescore_nbest(nbest, lm_nll, alpha=1.0, beta=0.0):
    """nbest: {uid: {bid: (am_score, tokens_or_text)}}; lm_nll:
    {(uid, bid): nll_nats}. Returns {uid: best (score, hyp)}.

    score = am_score − α·nll + β·len (am_score is a log-prob)."""
    out = {}
    for uid, hyps in nbest.items():
        best = None
        for bid, (am, hyp) in hyps.items():
            L = len(hyp.split()) if isinstance(hyp, str) else len(hyp)
            score = am - alpha * lm_nll[(uid, bid)] + beta * L
            if best is None or score > best[0]:
                best = (score, hyp)
        out[uid] = best
    return out


def ngram_nll(lm, nbest, tokenizer=None):
    """{(uid,bid): nll nats} using a backoff n-gram LM."""
    out = {}
    for uid, hyps in nbest.items():
        for bid, (_, hyp) in hyps.items():
            toks = hyp.split() if isinstance(hyp, str) else list(hyp)
            out[(uid, bid)] = -lm.score_sentence(toks) * LN10
    return out


def neural_nll(model, params, nbest, tokenizer):
    """{(uid,bid): nll nats} using a neural LM over token ids."""
    from cat_tpu.lm.train import sentence_nll

    keys, seqs = [], []
    for uid, hyps in nbest.items():
        for bid, (_, hyp) in hyps.items():
            ids = tokenizer.encode(hyp) if isinstance(hyp, str) else list(
                hyp)
            keys.append((uid, bid))
            seqs.append(ids)
    nll = sentence_nll(model, params, seqs)
    return {k: float(v) for k, v in zip(keys, nll)}


def search_lm_weight(nbest, lm_nll, refs, alphas, betas=(0.0,),
                     char_level=False, tokenizer=None):
    """Grid-search α/β by WER on a dev n-best list
    (cat/utils/lmweight_search.py equivalent)."""
    from cat_tpu.utils.wer import wer

    best = None
    for a in alphas:
        for b in betas:
            res = rescore_nbest(nbest, lm_nll, a, b)
            hyps = {}
            for uid, (_, hyp) in res.items():
                if not isinstance(hyp, str):
                    hyp = (tokenizer.decode(list(hyp)) if tokenizer
                           else " ".join(map(str, hyp)))
                hyps[uid] = hyp
            w = wer(refs, hyps, char_level=char_level)["wer"]
            if best is None or w < best[0]:
                best = (w, a, b)
    return {"wer": best[0], "alpha": best[1], "beta": best[2]}
