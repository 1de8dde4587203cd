"""Energy-based / TRF language models trained with NCE.

Counterpart of /root/reference/cat/lm/trf/model.py:21-1365 and
trf/train.py (trans-dimensional random field LMs with noise-contrastive
estimation, incl. dynamic noise): a network assigns an unnormalized
log-score φ_θ(x) plus per-length normalization ζ_l; training
discriminates data from n-gram noise samples.

  NCE loss = −E_data[log σ(Δ)] − ν·E_noise[log(1−σ(Δ))],
  Δ(x) = φ_θ(x) + ζ_{|x|} − log ν − log p_noise(x)
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

LN10 = math.log(10.0)


class EnergyLM(nn.Module):
    """BLSTM scorer: tokens → scalar unnormalized log-score + ζ_len."""

    vocab_size: int
    hdim: int = 256
    num_layers: int = 1
    max_len: int = 256

    @nn.compact
    def __call__(self, tokens, lengths, deterministic=True):
        from cat_tpu.models.encoders import LSTMStack

        emb = nn.Embed(self.vocab_size, self.hdim)(
            tokens.astype(jnp.int32))
        h = LSTMStack(self.hdim, self.num_layers, True, 0.0)(
            emb, lengths, deterministic)
        scores = nn.Dense(1)(h)[..., 0]               # (N, U)
        mask = (jnp.arange(tokens.shape[1])[None, :]
                < lengths[:, None])
        phi = jnp.sum(jnp.where(mask, scores, 0.0), axis=1)
        zeta = self.param("zeta", nn.initializers.zeros,
                          (self.max_len,))
        z = zeta[jnp.clip(lengths, 0, self.max_len - 1)]
        return phi + z


def sample_from_ngram(lm, num, max_len=32, seed=0, vocab=None):
    """Host-side ancestral sampling from a backoff n-gram LM.

    Returns (sequences, log10 probs)."""
    rng = np.random.default_rng(seed)
    from cat_tpu.fst.ngram import BOS, EOS

    if vocab is None:
        vocab = sorted(w for (w,) in lm.probs[1]
                       if w not in (BOS, EOS, "<unk>"))
    seqs, lps = [], []
    for _ in range(num):
        ctx = (BOS,) * (lm.order - 1) if lm.order > 1 else ()
        seq, total = [], 0.0
        for _ in range(max_len):
            cand = vocab + [EOS]
            logps = np.asarray([lm.logp(ctx, w) for w in cand])
            p = 10.0 ** logps
            p = p / p.sum()
            k = rng.choice(len(cand), p=p)
            total += float(logps[k])
            if cand[k] == EOS:
                break
            seq.append(cand[k])
            ctx = (ctx + (cand[k],))[-(lm.order - 1):] \
                if lm.order > 1 else ()
        seqs.append(seq)
        lps.append(total)
    return seqs, np.asarray(lps)


def make_nce_loss(model, nu=1.0):
    """loss(params, batch) where batch contains padded data and noise
    token arrays with their noise-LM log-probs (nats)."""

    def loss_fn(params, batch, deterministic=True):
        def delta(tokens, lengths, noise_logp):
            phi = model.apply({"params": params}, tokens, lengths,
                              deterministic=deterministic)
            return phi - math.log(max(nu, 1e-9)) - noise_logp

        d_data = delta(batch["data_tokens"], batch["data_lengths"],
                       batch["data_noise_logp"])
        d_noise = delta(batch["noise_tokens"], batch["noise_lengths"],
                        batch["noise_noise_logp"])
        loss = (-jnp.mean(jax.nn.log_sigmoid(d_data))
                - nu * jnp.mean(jax.nn.log_sigmoid(-d_noise)))
        acc = 0.5 * (jnp.mean((d_data > 0).astype(jnp.float32))
                     + jnp.mean((d_noise < 0).astype(jnp.float32)))
        return loss, acc

    return loss_fn


def pad_token_batch(seqs, sym2id, max_len):
    N = len(seqs)
    tokens = np.zeros((N, max_len), np.int32)
    lengths = np.zeros((N,), np.int32)
    for i, s in enumerate(seqs):
        ids = [sym2id[w] if not isinstance(w, (int, np.integer))
               else int(w) for w in s][:max_len]
        tokens[i, : len(ids)] = ids
        lengths[i] = len(ids)
    return tokens, lengths


def rescore_energy(model, params, seqs_ids, max_len=256):
    """Unnormalized log-scores usable for n-best rescoring
    (relative scores only — TRF semantics)."""
    N = len(seqs_ids)
    U = min(max(max(len(s) for s in seqs_ids), 1), max_len)
    tokens = np.zeros((N, U), np.int32)
    lengths = np.zeros((N,), np.int32)
    for i, s in enumerate(seqs_ids):
        ids = list(s)[:U]
        tokens[i, : len(ids)] = ids
        lengths[i] = len(ids)
    phi = model.apply({"params": params}, jnp.asarray(tokens),
                      jnp.asarray(lengths), deterministic=True)
    return np.asarray(phi)
