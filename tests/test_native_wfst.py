"""Native C++ WFST decoder must agree with the Python reference."""
import shutil

import numpy as np
import pytest

from cat_tpu.fst.decode import WfstDecoder
from tests.test_tlg import am_for, build_toy


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_matches_python():
    tlg, phone2id, word2id = build_toy()
    dec = WfstDecoder(tlg, beam=30.0)
    cases = [
        am_for([3, 1, 2]),           # "cab"
        am_for([2, 1, 3, 1, 2]),     # "ba cab"
        am_for([1, 2]),              # "ab"
        am_for([1, 2], peak=0.7),
    ]
    for lp in cases:
        py = dec.decode(lp, len(lp))[0]
        nat = dec.decode_native(lp, len(lp))
        assert nat[1] == py[1], (nat, py)
        assert abs(nat[0] - py[0]) < 1e-3, (nat, py)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_nbest_matches_python():
    """K-token n-best (wfst_nbest): the 1-best must equal the python
    decoder's, lists are score-sorted, hypotheses distinct, and the
    python n-best's top alternatives appear among them."""
    tlg, phone2id, word2id = build_toy()
    dec = WfstDecoder(tlg, beam=30.0)
    for lp in [am_for([3, 1, 2]), am_for([2, 1, 3, 1, 2]),
               am_for([1, 2], peak=0.7)]:
        py = dec.decode(lp, len(lp), nbest=4)
        nat = dec.decode_native_nbest(lp, len(lp), nbest=4)
        assert nat, nat
        assert nat[0][1] == py[0][1], (nat, py)
        assert abs(nat[0][0] - py[0][0]) < 1e-3
        scores = [s for s, _ in nat]
        assert scores == sorted(scores, reverse=True)
        seqs = [tuple(w) for _, w in nat]
        assert len(set(seqs)) == len(seqs)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_is_fast_on_long_input():
    import time

    tlg, _, _ = build_toy()
    dec = WfstDecoder(tlg, beam=30.0)
    rng = np.random.default_rng(0)
    T, V = 2000, 4
    lp = np.log(np.maximum(
        rng.dirichlet(np.ones(V), size=T), 1e-8)).astype(np.float32)
    t0 = time.time()
    nat = dec.decode_native(lp, T)
    t_native = time.time() - t0
    assert np.isfinite(nat[0])
    # native path should handle 20 s of frames well under a second
    assert t_native < 1.0, t_native
