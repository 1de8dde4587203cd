"""Tests for determinize_star / minimize_encoded (fst.py)."""
import numpy as np

from cat_tpu.fst.fst import (EPS, Fst, NEG_INF, determinize_star,
                             minimize_encoded)


def viterbi_accept(fst, ilabels):
    """Best path log-weight for an input label sequence (max semiring),
    with input-ε closure. Returns (score, output labels) or None."""
    import heapq

    by_src = [[] for _ in range(fst.num_states)]
    for a in fst.arcs:
        by_src[a[0]].append(a)

    def closure(states):
        best = dict(states)
        stack = list(states.items())
        while stack:
            (s, outs), w = stack.pop()
            for src, dst, il, ol, aw in by_src[s]:
                if il != EPS:
                    continue
                no = outs + ((ol,) if ol != EPS else ())
                k = (dst, no)
                if w + aw > best.get(k, NEG_INF) + 1e-9:
                    best[k] = w + aw
                    stack.append((k, w + aw))
        return best

    cur = closure({(fst.start, ()): 0.0})
    for x in ilabels:
        nxt = {}
        for (s, outs), w in cur.items():
            for src, dst, il, ol, aw in by_src[s]:
                if il != x:
                    continue
                no = outs + ((ol,) if ol != EPS else ())
                k = (dst, no)
                if w + aw > nxt.get(k, NEG_INF):
                    nxt[k] = w + aw
        cur = closure(nxt)
        if not cur:
            return None
    best = None
    for (s, outs), w in cur.items():
        if s in fst.finals:
            sc = w + fst.finals[s]
            if best is None or sc > best[0]:
                best = (sc, outs)
    return best


def nondet_example():
    """Two paths for input [1,2] with different weights + an ε arc."""
    f = Fst()
    for _ in range(6):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 1, 7, -1.0)
    f.add_arc(0, 2, 1, 7, -0.5)
    f.add_arc(1, 3, 2, 8, -0.2)
    f.add_arc(2, 3, 2, 9, -2.0)
    f.add_arc(3, 4, EPS, EPS, -0.1)   # input-ε
    f.add_arc(0, 5, 3, EPS, -0.3)
    f.set_final(4, -0.05)
    f.set_final(5, 0.0)
    return f


def is_deterministic(fst):
    seen = set()
    for src, dst, il, ol, w in fst.arcs:
        if il == EPS:
            continue  # factored output chains use ε inputs
        if (src, il) in seen:
            return False
        seen.add((src, il))
    return True


def test_determinize_star_equivalence():
    f = nondet_example()
    d = determinize_star(f)
    assert is_deterministic(d)
    for seq in ([1, 2], [3], [1], [2], [1, 2, 2]):
        a, b = viterbi_accept(f, seq), viterbi_accept(d, seq)
        if a is None:
            assert b is None, seq
        else:
            assert b is not None, seq
            assert np.isclose(a[0], b[0], atol=1e-5), (seq, a, b)
            assert a[1] == b[1], (seq, a, b)


def test_determinize_star_merges_prefixes():
    f = nondet_example()
    d = determinize_star(f)
    # the two input-1 arcs collapse into one
    n1 = sum(1 for a in d.arcs if a[2] == 1)
    assert n1 == 1


def test_minimize_encoded_equivalence():
    # two redundant tails accepting label 2 with the same weight
    f = Fst()
    for _ in range(5):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 1, 0, -0.5)
    f.add_arc(0, 2, 2, 0, -0.7)
    f.add_arc(1, 3, 2, 0, -0.3)
    f.add_arc(2, 4, 2, 0, -0.3)
    f.set_final(3, 0.0)
    f.set_final(4, 0.0)
    m = minimize_encoded(f)
    assert m.num_states < f.num_states  # 3 and 4 merge
    for seq in ([1, 2], [2, 2], [1], [2]):
        a, b = viterbi_accept(f, seq), viterbi_accept(m, seq)
        if a is None:
            assert b is None
        else:
            assert b is not None and np.isclose(a[0], b[0], atol=1e-5)


def test_det_min_pipeline_on_lexicon_graph():
    """L∘G-shaped graph: det+min shrinks it and preserves best paths."""
    from cat_tpu.fst.fst import compose, connect
    from cat_tpu.fst.graph import arpa_to_fst, lexicon_fst
    from cat_tpu.fst.ngram import train_ngram

    lexicon = [("ab", ["a", "b"]), ("ba", ["b", "a"]), ("aa", ["a", "a"])]
    word2id = {"ab": 1, "ba": 2, "aa": 3}
    phone2id = {"a": 1, "b": 2}
    lm = train_ngram([["ab", "ba"], ["aa"], ["ab", "aa"]], order=2,
                     vocab=list(word2id))
    G = arpa_to_fst(lm, sym2id=word2id)
    L = lexicon_fst(lexicon, word2id, phone2id)
    LG = connect(compose(L, G))
    det = determinize_star(LG)
    dm = minimize_encoded(det)
    for seq in ([1, 2], [1, 2, 2, 1], [1, 1], [2, 1, 1, 1]):
        a, b = viterbi_accept(LG, seq), viterbi_accept(dm, seq)
        if a is None:
            assert b is None, seq
        else:
            assert b is not None, seq
            assert np.isclose(a[0], b[0], atol=1e-4), (seq, a, b)
            assert a[1] == b[1], seq
