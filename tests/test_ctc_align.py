"""CTC forced alignment: collapses to the transcript, matches peaks."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.ctc_align import ctc_forced_align


def test_alignment_collapses_to_transcript():
    rng = np.random.default_rng(0)
    N, T, V, U = 3, 30, 6, 4
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((N, T, V)).astype(np.float32) * 2), axis=-1))
    labels = rng.integers(1, V, size=(N, U)).astype(np.int32)
    il = np.array([30, 24, 18], np.int32)
    ul = np.array([4, 3, 2], np.int32)
    frames, scores = jax.jit(ctc_forced_align)(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il),
        jnp.asarray(ul))
    frames = np.asarray(frames)
    for n in range(N):
        seq, prev = [], -1
        for s in frames[n, : il[n]]:
            if s != prev and s != 0:
                seq.append(int(s))
            prev = int(s)
        assert seq == list(labels[n, : ul[n]]), (n, seq, labels[n])
        # padded region is blank
        assert np.all(frames[n, il[n]:] == 0)
        assert np.isfinite(scores[n])


def test_alignment_follows_peaked_logits():
    """With sharply peaked logits matching a known alignment, the
    Viterbi path must recover it exactly."""
    V = 4
    ali = [0, 1, 1, 0, 2, 0, 3, 3, 0]
    T = len(ali)
    lp = np.full((1, T, V), np.log(0.01 / (V - 1)), np.float32)
    for t, v in enumerate(ali):
        lp[0, t, v] = np.log(0.99)
    labels = np.array([[1, 2, 3]], np.int32)
    frames, _ = ctc_forced_align(jnp.asarray(lp), jnp.asarray(labels),
                                 jnp.asarray([T], np.int32),
                                 jnp.asarray([3], np.int32))
    assert list(np.asarray(frames)[0]) == ali
