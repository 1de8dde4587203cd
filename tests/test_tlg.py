"""Tests for TLG graph building + WFST Viterbi beam decoding."""
import numpy as np

from cat_tpu.fst.decode import WfstDecoder, build_tlg
from cat_tpu.fst.ngram import train_ngram


def build_toy():
    # phones: a=1 b=2 c=3 (AM ids; blank=0, V=4)
    phone2id = {"a": 1, "b": 2, "c": 3}
    word2id = {"cab": 1, "ba": 2, "ab": 3}
    lexicon = [("cab", ["c", "a", "b"]), ("ba", ["b", "a"]),
               ("ab", ["a", "b"])]
    corpus = [["cab", "ba"], ["ba", "cab"], ["ab"], ["cab"], ["ba"],
              ["cab", "ab"]]
    lm = train_ngram(corpus, order=2)
    tlg = build_tlg(lexicon, lm, phone2id, word2id, num_classes=4)
    return tlg, phone2id, word2id


def am_for(phone_ids, V=4, T_per=2, peak=0.95):
    """Synthetic AM posteriors: each phone spans T_per frames with a
    blank frame between phones."""
    rows = []
    for p in phone_ids:
        for _ in range(T_per):
            r = np.full(V, (1 - peak) / (V - 1))
            r[p] = peak
            rows.append(np.log(r))
        r = np.full(V, (1 - peak) / (V - 1))
        r[0] = peak
        rows.append(np.log(r))
    return np.asarray(rows, np.float32)


def test_tlg_builds():
    tlg, _, _ = build_toy()
    assert tlg.num_states > 0 and tlg.num_arcs > 0
    assert len(tlg.finals) > 0


def test_wfst_decode_single_word():
    tlg, phone2id, word2id = build_toy()
    dec = WfstDecoder(tlg, beam=30.0)
    # say "cab": phones c a b
    lp = am_for([3, 1, 2])
    res = dec.decode(lp, len(lp))
    assert res[0][1] == [word2id["cab"]], res


def test_wfst_decode_two_words():
    tlg, phone2id, word2id = build_toy()
    dec = WfstDecoder(tlg, beam=30.0)
    # "ba cab": b a | c a b
    lp = am_for([2, 1, 3, 1, 2])
    res = dec.decode(lp, len(lp))
    assert res[0][1] == [word2id["ba"], word2id["cab"]], res


def test_wfst_lm_disambiguates():
    """'ab' vs 'a b'-like confusion: the LM should prefer seen bigrams."""
    tlg, phone2id, word2id = build_toy()
    dec = WfstDecoder(tlg, beam=30.0)
    # ambiguous phones a b — could be word "ab" or suffix of others;
    # with clean AM it must decode to "ab" (the only lexicon match)
    lp = am_for([1, 2])
    res = dec.decode(lp, len(lp))
    assert res[0][1] == [word2id["ab"]], res


def test_wfst_nbest():
    tlg, phone2id, word2id = build_toy()
    dec = WfstDecoder(tlg, beam=50.0)
    lp = am_for([1, 2], peak=0.7)
    res = dec.decode(lp, len(lp), nbest=3)
    assert len(res) >= 1
    assert res[0][0] >= res[-1][0]
