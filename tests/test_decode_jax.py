"""On-device CTC beam search must match the host reference decoder."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ctc.decode import prefix_beam_search
from cat_tpu.ctc.decode_jax import ctc_beam_search_device


def make_lp(rng, N, T, V, sharp=2.0):
    x = rng.standard_normal((N, T, V)).astype(np.float32) * sharp
    return np.asarray(jax.nn.log_softmax(jnp.asarray(x), axis=-1))


def test_device_beam_matches_host():
    rng = np.random.default_rng(0)
    N, T, V = 4, 12, 6
    lp = make_lp(rng, N, T, V)
    lengths = np.array([12, 10, 8, 12], np.int32)
    pref, plen, scores = ctc_beam_search_device(
        jnp.asarray(lp), jnp.asarray(lengths), beam_width=8, topk=6,
        max_len=16)
    pref, plen, scores = map(np.asarray, (pref, plen, scores))
    for n in range(N):
        host = prefix_beam_search(lp[n], int(lengths[n]), beam_width=16,
                                  nbest=3)
        dev_best = list(pref[n, 0, : plen[n, 0]])
        host_best = list(host[0][1])
        assert dev_best == host_best, (n, dev_best, host_best)
        assert abs(scores[n, 0] - host[0][0]) < 2e-2, (
            n, scores[n, 0], host[0][0])


def test_device_beam_greedyish_on_peaked():
    V = 5
    ali = [0, 1, 0, 2, 2, 0, 3]
    T = len(ali)
    lp = np.full((1, T, V), np.log(0.02 / (V - 1)), np.float32)
    for t, v in enumerate(ali):
        lp[0, t, v] = np.log(0.98)
    pref, plen, scores = ctc_beam_search_device(
        jnp.asarray(lp), jnp.asarray([T], np.int32), beam_width=4,
        topk=4, max_len=8)
    assert list(np.asarray(pref)[0, 0, : int(plen[0, 0])]) == [1, 2, 3]


def test_device_beam_batch_independence():
    """Each utterance's result is independent of batch composition."""
    rng = np.random.default_rng(1)
    lp = make_lp(rng, 3, 10, 5)
    lens = np.array([10, 9, 7], np.int32)
    p_all, l_all, s_all = ctc_beam_search_device(
        jnp.asarray(lp), jnp.asarray(lens), beam_width=4, topk=4,
        max_len=12)
    p_one, l_one, s_one = ctc_beam_search_device(
        jnp.asarray(lp[1:2]), jnp.asarray(lens[1:2]), beam_width=4,
        topk=4, max_len=12)
    np.testing.assert_array_equal(np.asarray(p_all)[1],
                                  np.asarray(p_one)[0])
    np.testing.assert_allclose(np.asarray(s_all)[1],
                               np.asarray(s_one)[0], atol=1e-5)
