"""JSA-SPG cascade decoding: speech → phonemes → graphemes.

Counterpart of /root/reference/cat/ctc/decode_jsa{,_mls,_s2p,_g2p}.py
(259-308 LoC each): decode S2P n-best phoneme sequences, run each
through P2G, and marginalize grapheme scores over the phoneme n-best
(the marginal-likelihood scoring mode).
"""
from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ctc.decode import prefix_beam_search


def _lae(a, b):
    if a <= -1e29:
        return b
    if b <= -1e29:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


class JsaCascadeDecoder:
    """S2P → P2G cascade with marginalization over phoneme n-best."""

    def __init__(self, s2p, p2g, params_s2p, params_p2g, upsample=2,
                 s2p_beam=8, p2g_beam=8, num_z=4):
        self.upsample = upsample
        self.s2p_beam = s2p_beam
        self.p2g_beam = p2g_beam
        self.num_z = num_z
        self._s2p = jax.jit(lambda x, l: s2p.apply(
            {"params": params_s2p}, x, l, deterministic=True))
        self._p2g = jax.jit(lambda t, l: p2g.apply(
            {"params": params_p2g}, t, l, deterministic=True))

    def decode_s2p(self, feats, flens):
        """Phoneme n-best for one utterance: [(score, [ids])]."""
        logits, olen = self._s2p(jnp.asarray(feats[None]),
                                 jnp.asarray([flens], np.int32))
        lp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
        return prefix_beam_search(lp, int(olen[0]),
                                  beam_width=self.s2p_beam,
                                  nbest=self.num_z)

    def decode(self, feats, flens, marginalize=True):
        """Grapheme hypothesis for one utterance.

        marginalize=True: score(y) = logsumexp_z [s2p(z|x) + p2g(y|z)]
        over the phoneme n-best (decode_jsa_mls); otherwise best-path
        cascade."""
        z_nbest = self.decode_s2p(feats, flens)
        y_scores: dict = defaultdict(lambda: -1e30)
        for z_score, z in z_nbest:
            z = list(z)
            if not z:
                continue
            z_up = np.repeat(np.asarray(z, np.int32), self.upsample)
            logits, olen = self._p2g(jnp.asarray(z_up[None]),
                                     jnp.asarray([len(z_up)], np.int32))
            lp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
            for y_score, y in prefix_beam_search(
                    lp, int(olen[0]), beam_width=self.p2g_beam,
                    nbest=self.num_z):
                total = z_score + y_score
                key = tuple(y)
                if marginalize:
                    y_scores[key] = _lae(y_scores[key], total)
                else:
                    y_scores[key] = max(y_scores[key], total)
        if not y_scores:
            return []
        ranked = sorted(y_scores.items(), key=lambda kv: -kv[1])
        return [(s, list(y)) for y, s in ranked]
