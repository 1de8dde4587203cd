"""Neural-LM fusion scorer: logp(context, token) in log10.

Counterpart of /root/reference/cat/shared/decoder.py:705-795 (the
AbsDecoder scorer interface used for shallow fusion / LODR at RNN-T
decode, cat/rnnt/decode.py:285-301). The host beam searches call
logp(ctx, tok) per expansion; here one jitted LM forward per DISTINCT
context is memoized and returns the full next-token distribution, so
scoring all tokens of a context costs one device call. Contexts are
padded to power-of-2 buckets to bound the number of compiled shapes.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

LN10 = math.log(10.0)


class NeuralLMScorer:
    """Wraps a causal LM (cat_tpu.lm.train.build_model convention:
    model(tokens, lengths) → (logits, aux); id 0 = <s>/BOS)."""

    def __init__(self, model, params, bos=0, max_cache=100000):
        self.bos = bos
        self.max_cache = max_cache
        self._cache = {}
        self._apply = jax.jit(lambda t, l: model.apply(
            {"params": params}, t, l, deterministic=True))

    def _dist(self, ctx):
        hit = self._cache.get(ctx)
        if hit is not None:
            return hit
        seq = (self.bos,) + tuple(int(t) for t in ctx)
        L = len(seq)
        cap = 1 << (L - 1).bit_length()  # next pow2 ≥ L
        arr = np.zeros((1, max(cap, 4)), np.int32)
        arr[0, :L] = seq
        out = self._apply(jnp.asarray(arr),
                          jnp.asarray([L], jnp.int32))
        logits = out[0] if isinstance(out, tuple) else out
        lp = jax.nn.log_softmax(
            logits[0, L - 1].astype(jnp.float32), -1)
        lp10 = np.asarray(lp) / LN10
        if len(self._cache) < self.max_cache:
            self._cache[ctx] = lp10
        return lp10

    def logp(self, context, tok):
        """log10 p(tok | context) — the fusion interface shared with
        fst.ngram.NGramLM and rnnt.decode.CombinedLM."""
        return float(self._dist(tuple(context))[int(tok)])
