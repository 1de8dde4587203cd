"""Tests for the from-scratch WFST subsystem."""
import math

import numpy as np
import pytest

from cat_tpu.fst.fst import EPS, NEG_INF, Fst, compose, connect, rm_epsilon
from cat_tpu.fst.graph import DenGraph, arpa_to_fst, ctc_topo, build_den_fst
from cat_tpu.fst.ngram import (BOS, EOS, NGramLM, read_arpa, train_ngram,
                               write_arpa)


def test_ngram_probs_normalize():
    corpus = [list("abcab"), list("aabbc"), list("cab"), list("abc"),
              list("bca"), list("aa")]
    lm = train_ngram(corpus, order=2)
    vocab = ["a", "b", "c", EOS]
    for ctx in [(), ("a",), ("b",), (BOS,)]:
        total = sum(10.0 ** lm.logp(ctx, w) for w in vocab)
        assert abs(total - 1.0) < 0.05, (ctx, total)


def test_ngram_arpa_roundtrip(tmp_path):
    corpus = [list("abab"), list("bba"), list("aab")]
    lm = train_ngram(corpus, order=2)
    p = str(tmp_path / "lm.arpa")
    write_arpa(lm, p)
    lm2 = read_arpa(p)
    for k in range(1, 3):
        for ng, lp in lm.probs[k].items():
            assert abs(lm2.probs[k][ng] - lp) < 1e-5
    assert abs(lm.perplexity(corpus) - lm2.perplexity(corpus)) < 1e-3


def test_ngram_perplexity_learns():
    train = [list("ababab"), list("abab"), list("ababab")]
    lm = train_ngram(train, order=2)
    good = lm.perplexity([list("abab")])
    bad = lm.perplexity([list("bbba")])
    assert good < bad


def brute_force_accept(fst, ilabels):
    """logsumexp of path weights accepting the exact ilabel sequence."""
    if fst.num_states == 0 or fst.start < 0:
        return NEG_INF
    cur = {fst.start: 0.0}
    by_state = fst.arcs_by_state()

    def lae(a, b):
        if a <= NEG_INF / 2:
            return b
        if b <= NEG_INF / 2:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    for sym in ilabels:
        nxt = {}
        for s, w in cur.items():
            for _, dst, il, ol, aw in by_state[s]:
                if il == sym:
                    nxt[dst] = lae(nxt.get(dst, NEG_INF), w + aw)
        cur = nxt
        if not cur:
            return NEG_INF
    total = NEG_INF
    for s, w in cur.items():
        if s in fst.finals:
            total = lae(total, w + fst.finals[s])
    return total


def test_ctc_topo_deterministic_and_complete():
    V = 4
    T = ctc_topo(V)
    by_state = T.arcs_by_state()
    for s in range(T.num_states):
        ilabels = [a[2] for a in by_state[s]]
        assert sorted(ilabels) == list(range(1, V + 1)), (s, ilabels)


def test_compose_rm_eps_den_graph_free_lm():
    """With a weight-0 one-state G, the den graph must accept every AM
    sequence with weight exactly 0 (input-deterministic topology)."""
    V = 3  # blank + 2 phones
    T = ctc_topo(V)
    G = Fst()
    s = G.add_state()
    G.start = s
    G.set_final(s, 0.0)
    for p in range(1, V):
        G.add_arc(s, s, p, p, 0.0)
    den = rm_epsilon(compose(T, G))
    assert den.num_states > 0
    rng = np.random.default_rng(0)
    for _ in range(10):
        seq = rng.integers(1, V + 1, size=5)  # ilabels 1..V
        w = brute_force_accept(den, list(seq))
        assert abs(w) < 1e-6, (seq, w)


def test_den_graph_weights_match_lm():
    """Den graph acceptance weight of an alignment == LM prob of its
    collapsed phone sequence (for fully-observed ngrams)."""
    # phones symbols: 1, 2 (AM ids), vocab V=3 with blank=0
    corpus = [[1, 2, 1], [1, 1, 2], [2, 1], [1, 2], [1, 2, 2, 1]]
    lm = train_ngram(corpus, order=2)
    den = build_den_fst(lm, num_classes=3)
    g = DenGraph.from_fst(den)
    assert g.arc_label.min() >= 0

    # alignment: blank(0) 1 1 blank 2 -> phones [1, 2]
    ali = [0 + 1, 1 + 1, 1 + 1, 0 + 1, 2 + 1]  # ilabels (AM id + 1)
    w = brute_force_accept(den, ali)
    expect_ln = lm.score_sentence([1, 2]) * math.log(10.0)
    # Backoff-as-epsilon graphs accept via BOTH the explicit n-gram arc and
    # the backoff path (standard arpa2fst approximation, same as the
    # reference's graphs): graph mass >= exact LM prob, within log(2)-ish.
    assert w >= expect_ln - 1e-4, (w, expect_ln)
    assert w - expect_ln < 0.7, (w, expect_ln)


def test_compose_filter_no_double_count():
    """Epsilon interleavings must not duplicate weight mass."""
    # fst1: a:eps then b:x ; fst2: eps-loop free, x:x
    f1 = Fst()
    s0, s1, s2 = f1.add_state(), f1.add_state(), f1.add_state()
    f1.start = s0
    f1.add_arc(s0, s1, 1, EPS, math.log(0.5))
    f1.add_arc(s1, s2, 2, 5, math.log(0.5))
    f1.set_final(s2, 0.0)
    f2 = Fst()
    q0, q1, q2 = f2.add_state(), f2.add_state(), f2.add_state()
    f2.start = q0
    f2.add_arc(q0, q1, EPS, EPS, math.log(0.5))  # eps arc in fst2
    f2.add_arc(q1, q2, 5, 5, math.log(0.5))
    f2.set_final(q2, 0.0)
    c = compose(f1, f2)
    # single path: weight = log(0.5)*4
    w = brute_force_accept(c, [1, 2])
    assert abs(w - 4 * math.log(0.5)) < 1e-6


def test_fst_text_roundtrip(tmp_path):
    f = ctc_topo(3)
    p = str(tmp_path / "t.fst.txt")
    f.write_text(p)
    f2 = Fst.read_text(p)
    assert f2.num_states == f.num_states
    assert len(f2.arcs) == len(f.arcs)
    assert set(f2.finals) == set(f.finals)
