"""Tests for CTC decoding (greedy, prefix beam search) and WER."""
import itertools
import math

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ctc.decode import (batch_prefix_beam_search, greedy_decode,
                                prefix_beam_search)
from cat_tpu.fst.ngram import train_ngram
from cat_tpu.utils.wer import edit_distance, oracle_wer, wer


def test_edit_distance():
    assert edit_distance("abc", "abc")[0] == 0
    e, s, i, d = edit_distance(list("kitten"), list("sitting"))
    assert e == 3
    assert edit_distance([], list("ab"))[0] == 2


def test_wer_basic():
    refs = {"a": "the cat sat", "b": "hello world"}
    hyps = {"a": "the cat sit", "b": "hello word"}
    r = wer(refs, hyps)
    assert abs(r["wer"] - 100.0 * 2 / 5) < 1e-6
    assert r["ser"] == 100.0


def test_oracle_wer():
    refs = {"a": "x y"}
    nbest = {"a": {0: (0.0, "x z"), 1: (-1.0, "x y")}}
    assert oracle_wer(refs, nbest)["errors"] == 0


def exact_ctc_seq_logprob(lp, labels, blank=0):
    """Brute-force: logsumexp over all alignments mapping to labels."""
    T, V = lp.shape
    best = -1e30
    total = -1e30
    for ali in itertools.product(range(V), repeat=T):
        # collapse
        seq, prev = [], -1
        for s in ali:
            if s != prev and s != blank:
                seq.append(s)
            prev = s
        if seq == list(labels):
            w = sum(lp[t, ali[t]] for t in range(T))
            m = max(total, w)
            total = m + math.log(math.exp(total - m) + math.exp(w - m))
    return total


def test_greedy_decode():
    lp = np.full((1, 4, 3), -10.0, np.float32)
    # frames: blank, 1, 1, 2 → [1, 2]
    for t, v in enumerate([0, 1, 1, 2]):
        lp[0, t, v] = -0.01
    out = greedy_decode(jnp.asarray(lp), jnp.asarray([4]))
    assert out == [[1, 2]]


def test_prefix_beam_matches_bruteforce():
    rng = np.random.default_rng(0)
    T, V = 5, 3
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((T, V)).astype(np.float32) * 2),
        axis=-1))
    res = prefix_beam_search(lp, T, beam_width=64, nbest=5)
    # exact posterior of the best prefix
    best_score, best_prefix = res[0]
    exact = exact_ctc_seq_logprob(lp, list(best_prefix))
    assert abs(best_score - exact) < 1e-3, (best_score, exact)
    # and it is the true argmax over ALL label sequences (repeats are
    # valid CTC outputs — they need a blank in between)
    all_seqs = []
    for L in range(0, 5):
        all_seqs.extend(itertools.product(range(1, V), repeat=L))
    scores = {s: exact_ctc_seq_logprob(lp, list(s)) for s in all_seqs}
    true_best = max(scores, key=scores.get)
    assert tuple(best_prefix) == true_best


def test_prefix_beam_with_lm_fusion():
    # LM strongly prefers token 1 after 1; check fusion changes ranking
    corpus = [[1, 1, 1], [1, 1], [1, 1, 1, 1]]
    lm = train_ngram(corpus, order=2)
    rng = np.random.default_rng(1)
    T, V = 4, 3
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((T, V)).astype(np.float32) * 0.1),
        axis=-1))
    no_lm = prefix_beam_search(lp, T, beam_width=16)
    with_lm = prefix_beam_search(lp, T, beam_width=16, lm=lm, alpha=2.0)
    # under heavy LM weight, best prefix should be all 1s
    assert all(t == 1 for t in with_lm[0][1]) and len(with_lm[0][1]) > 0
    assert no_lm[0][1] != with_lm[0][1] or all(
        t == 1 for t in no_lm[0][1])


def test_batch_wrapper():
    rng = np.random.default_rng(2)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32)),
        axis=-1))
    out = batch_prefix_beam_search(lp, [6, 4], beam_width=8, nbest=2)
    assert len(out) == 2 and len(out[0]) == 2
