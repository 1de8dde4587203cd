"""RNN-T decoding: fully-jitted batched greedy + beam search.

Counterpart of /root/reference/cat/rnnt/rnnt_decoder.py: RNNTDecoder
batch_decode (:146-470 — batched beam search with cross-utterance beam
grouping, prefix cache, shallow fusion, ILM subtraction).

TPU design:
- greedy_decode is ONE compiled program: lax.scan over frames with a
  bounded emissions-per-frame inner loop; beams never leave the device.
- beam_search keeps the search control flow on host but batches ALL
  (utterance × beam) predictor/joiner evaluations through two jitted
  step functions — the moral equivalent of the reference's
  group_to_batch (+ PrefixCacheDict) without per-beam kernel launches.
"""
from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30
LN10 = math.log(10.0)


def _tree_where(mask, a, b):
    """Select per-batch-element between two pytrees (mask (N,))."""
    def sel(x, y):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)
    return jax.tree_util.tree_map(sel, a, b)


def _as_variables(params_or_state, batch_stats=None):
    """Accept a TrainState, a full variables dict, or bare params, and
    return a flax variables dict with batch_stats included when present
    (the reference restores the full model state at decode,
    cat/rnnt/decode.py:204-217 — dropping batch_stats breaks BatchNorm
    encoders, e.g. the default ConformerNet)."""
    if hasattr(params_or_state, "params"):  # TrainState
        v = {"params": params_or_state.params}
        bs = getattr(params_or_state, "batch_stats", None)
        if bs:
            v["batch_stats"] = bs
        return v
    if isinstance(params_or_state, dict) and "params" in params_or_state:
        return dict(params_or_state)
    v = {"params": params_or_state}
    if batch_stats:
        v["batch_stats"] = batch_stats
    return v


def make_greedy_decoder(model, blank=0, max_symbols=4, max_out=200,
                        joiner_normalized=False, batch_stats=None,
                        streaming=False):
    """Returns jitted fn(params, feats, flens) →
    (tokens (N, max_out), counts (N,)). `params` may be bare params, a
    {"params": ..., "batch_stats": ...} dict, or a TrainState.
    streaming=True uses model.encode_streaming (chunked CUSIDE encoding
    of a unified transducer, cat/rnnt/decode.py --streaming role)."""
    enc_method = model.encode_streaming if streaming else model.encode

    def decode(params, feats, flens):
        v = _as_variables(params, batch_stats)
        enc, olens = model.apply(v, feats, flens, deterministic=True,
                                 method=enc_method)
        N, T, _ = enc.shape
        state0 = model.predictor.init_state(N)
        bos = jnp.zeros((N,), jnp.int32)
        pred0, state0 = model.apply(v, bos, state0,
                                    method=model.predict_step)
        tokens0 = jnp.zeros((N, max_out), jnp.int32)
        counts0 = jnp.zeros((N,), jnp.int32)

        def frame_body(carry, xs):
            tokens, counts, pred_out, pred_state = carry
            enc_t, t = xs

            def sym_body(i, inner):
                tokens, counts, pred_out, pred_state, alive = inner
                logits = model.apply(v, enc_t, pred_out,
                                     method=model.join)
                best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = (alive & (best != blank) & (t < olens)
                        & (counts < max_out))
                n_idx = jnp.arange(N)
                tokens = tokens.at[n_idx, counts].set(
                    jnp.where(emit, best, tokens[n_idx, counts]))
                counts = counts + emit.astype(jnp.int32)
                new_out, new_state = model.apply(v, best, pred_state,
                                                 method=model.predict_step)
                pred_out = jnp.where(emit[:, None], new_out, pred_out)
                pred_state = _tree_where(emit, new_state, pred_state)
                return (tokens, counts, pred_out, pred_state, emit)

            alive = jnp.ones((N,), bool)
            tokens, counts, pred_out, pred_state, _ = jax.lax.fori_loop(
                0, max_symbols, sym_body,
                (tokens, counts, pred_out, pred_state, alive))
            return (tokens, counts, pred_out, pred_state), None

        enc_T = jnp.swapaxes(enc, 0, 1)  # (T, N, D)
        (tokens, counts, _, _), _ = jax.lax.scan(
            frame_body, (tokens0, counts0, pred0, state0),
            (enc_T, jnp.arange(T)))
        return tokens, counts

    return jax.jit(decode)


class CombinedLM:
    """Weighted combination of LM scorers — the MultiDecoder / LODR
    equivalent (decoder.py:705-795): e.g. NN LM with positive weight +
    n-gram with negative weight. Each scorer needs logp(ctx, tok) in
    log10; weights are applied on top of the decoder-level alpha."""

    def __init__(self, lms_and_weights):
        self.parts = list(lms_and_weights)

    def logp(self, context, tok):
        return sum(w * lm.logp(context, tok) for lm, w in self.parts)


class RNNTBeamDecoder:
    """Host beam search with jitted batched predictor/joiner steps.

    Options mirror cat/rnnt/decode.py:180-327: beam width, shallow
    fusion (n-gram via fst.ngram.NGramLM, or CombinedLM for LODR),
    length reward beta, internal-LM subtraction (ilm_weight — the ILM
    head is the joiner evaluated with a zero encoder contribution,
    decoder.py:660-702)."""

    def __init__(self, model, params, beam_width=8, blank=0,
                 lm=None, alpha=0.0, beta=0.0, max_symbols=3,
                 joiner_normalized=False, ilm_weight=0.0,
                 batch_stats=None, streaming=False):
        self.model = model
        self.params = params
        self.W = beam_width
        self.blank = blank
        self.lm = lm
        self.alpha = alpha
        self.beta = beta
        self.max_symbols = max_symbols
        from cat_tpu.models.joiner import HAT, LogAdd

        # LogAdd/HAT joiners return log-probs from decode-mode join
        if isinstance(model.joiner, (LogAdd, HAT)):
            joiner_normalized = True
        self.joiner_normalized = joiner_normalized
        self.ilm_weight = ilm_weight
        v = _as_variables(params, batch_stats)
        # streaming: chunked CUSIDE encoding (unified transducer)
        enc_method = model.encode_streaming if streaming \
            else model.encode
        self._encode = jax.jit(lambda f, l: model.apply(
            v, f, l, deterministic=True, method=enc_method))
        self._pred_step = jax.jit(lambda t, s: model.apply(
            v, t, s, method=model.predict_step))

        def _join(enc_t, pred):
            logits = model.apply(v, enc_t, pred, method=model.join)
            if joiner_normalized:
                lp = logits
            else:
                lp = jax.nn.log_softmax(logits, axis=-1)
            if ilm_weight != 0.0:
                ilm_logits = model.apply(v, jnp.zeros_like(enc_t), pred,
                                         method=model.join)
                ilm = jax.nn.log_softmax(ilm_logits, axis=-1)
                # subtract internal LM on label scores only (blank kept)
                lp = lp.at[..., 1:].add(-ilm_weight * ilm[..., 1:])
            return lp

        self._join = jax.jit(_join)

    def _lm_score(self, prefix, tok):
        if self.lm is None:
            return self.beta
        return self.alpha * self.lm.logp(tuple(prefix), tok) * LN10 \
            + self.beta

    def decode(self, feats, flens, nbest=1):
        """feats (N, T, F) → list (per utt) of [(score, [tokens])]."""
        enc, olens = self._encode(jnp.asarray(feats),
                                  jnp.asarray(flens))
        enc = np.asarray(enc)
        olens = np.asarray(olens)
        N, T, D = enc.shape
        W = self.W

        # initialize per-utterance beams: prefix () with bos predictor
        state0 = self.model.predictor.init_state(N)
        out0, st0 = self._pred_step(jnp.zeros((N,), jnp.int32), state0)
        out0 = np.asarray(out0)
        st0 = jax.tree_util.tree_map(np.asarray, st0)

        def state_slice(st, idx):
            return jax.tree_util.tree_map(lambda x: x[idx], st)

        # beams[n]: list of dict(prefix, score, pred_out, pred_state)
        beams = [[dict(prefix=(), score=0.0,
                       pred_out=out0[n],
                       pred_state=state_slice(st0, n))]
                 for n in range(N)]

        for t in range(T):
            active = [n for n in range(N) if t < olens[n]]
            if not active:
                break
            # flatten all active beams
            flat = [(n, b) for n in active for b in beams[n]]
            enc_rows = jnp.asarray(
                np.stack([enc[n, t] for n, _ in flat]))
            pred_rows = jnp.asarray(
                np.stack([b["pred_out"] for _, b in flat]))
            logp = np.asarray(self._join(enc_rows, pred_rows))  # (M, V)
            V = logp.shape[-1]

            # expand; the predictor state is a function of the prefix, so
            # merging same-prefix hypotheses is a pure score logaddexp
            # (the RNA prefix merge, rnnt_decoder.py:258-300)
            new_beams = {n: {} for n in active}

            def merge(n, prefix, sc, pred_out=None, pred_state=None,
                      parent=None):
                cand = new_beams[n].get(prefix)
                if cand is None:
                    new_beams[n][prefix] = dict(
                        prefix=prefix, score=sc, pred_out=pred_out,
                        pred_state=pred_state, parent=parent)
                else:
                    cand["score"] = float(
                        np.logaddexp(cand["score"], sc))
                    if cand["pred_out"] is None and pred_out is not None:
                        cand["pred_out"] = pred_out
                        cand["pred_state"] = pred_state
                        cand["parent"] = None

            for m, (n, b) in enumerate(flat):
                # blank: keep prefix (state already known)
                merge(n, b["prefix"],
                      b["score"] + float(logp[m, self.blank]),
                      pred_out=b["pred_out"], pred_state=b["pred_state"])
                # top labels: new prefixes needing a predictor step
                top = np.argsort(logp[m])[::-1][: W]
                for vtok in top:
                    if vtok == self.blank:
                        continue
                    ntok = int(vtok)
                    sc = (b["score"] + float(logp[m, ntok])
                          + self._lm_score(b["prefix"], ntok))
                    merge(n, b["prefix"] + (ntok,), sc,
                          parent=(m, ntok))
            # prune to W per utterance
            kept_step = []
            for n in active:
                entries = sorted(new_beams[n].values(),
                                 key=lambda e: -e["score"])[:W]
                beams[n] = entries
                for e in entries:
                    if e.get("pred_out") is None:
                        kept_step.append((n, e))
            # batched predictor step for surviving new prefixes
            if kept_step:
                parents = [flat[e["parent"][0]][1] for _, e in kept_step]
                toks = jnp.asarray(
                    np.asarray([e["parent"][1] for _, e in kept_step],
                               np.int32))
                pstates = jax.tree_util.tree_map(
                    lambda *xs: jnp.asarray(np.stack(xs)),
                    *[p["pred_state"] for p in parents])
                new_out, new_state = self._pred_step(toks, pstates)
                new_out = np.asarray(new_out)
                new_state = jax.tree_util.tree_map(np.asarray, new_state)
                for j, (_, e) in enumerate(kept_step):
                    e["pred_out"] = new_out[j]
                    e["pred_state"] = state_slice(new_state, j)
                    e.pop("parent", None)

        results = []
        for n in range(N):
            ranked = sorted(beams[n], key=lambda e: -e["score"])[:nbest]
            results.append([(e["score"], list(e["prefix"]))
                            for e in ranked])
        return results
