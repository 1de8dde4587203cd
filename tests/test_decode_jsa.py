"""Structural tests for the JSA-SPG cascade decoder."""
import numpy as np

import jax

from cat_tpu.ctc.decode_jsa import JsaCascadeDecoder
from cat_tpu.ctc.train_jsa import build_models


def test_cascade_decode():
    P, G, F = 5, 4, 6
    cfg = {
        "s2p": {"type": "LSTM",
                "kwargs": {"hdim": 12, "num_layers": 1,
                           "bidirectional": True, "dropout_rate": 0.0}},
        "p2g": {"type": "EmbeddingEncoder",
                "kwargs": {"num_cells": 1, "hdim": 12, "num_heads": 2,
                           "kernel_size": 3, "dropout_rate": 0.0}},
        "g2p": {"type": "EmbeddingEncoder",
                "kwargs": {"num_cells": 1, "hdim": 12, "num_heads": 2,
                           "kernel_size": 3, "dropout_rate": 0.0}},
    }
    s2p, p2g, g2p = build_models(cfg, num_phonemes=P, num_graphemes=G)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    feats = jnp.zeros((2, 20, F))
    lens = jnp.asarray([20, 20], jnp.int32)
    toks = jnp.zeros((2, 8), jnp.int32)
    tl = jnp.asarray([8, 8], jnp.int32)
    p_s2p = jax.jit(lambda k: s2p.init(k, feats, lens))(
        jax.random.PRNGKey(0))["params"]
    p_p2g = jax.jit(lambda k: p2g.init(k, toks, tl))(
        jax.random.PRNGKey(1))["params"]
    dec = JsaCascadeDecoder(s2p, p2g, p_s2p, p_p2g, upsample=3,
                            s2p_beam=4, p2g_beam=4, num_z=3)
    f = rng.standard_normal((20, F)).astype(np.float32)
    res_marg = dec.decode(f, 20, marginalize=True)
    res_max = dec.decode(f, 20, marginalize=False)
    assert len(res_marg) >= 1 and len(res_max) >= 1
    # ranked descending
    scores = [s for s, _ in res_marg]
    assert scores == sorted(scores, reverse=True)
    # marginal score of the best hyp >= its max-path score
    best_y = tuple(res_max[0][1])
    marg_map = {tuple(y): s for s, y in res_marg}
    if best_y in marg_map:
        assert marg_map[best_y] >= res_max[0][0] - 1e-6
