"""LLM-P2G training: seq2seq P2G + DANP + TKM/SKM marginalization.

Reference behavior being rebuilt (egs/llm-p2g):
- P2G model: seq2seq transformer, phoneme ids → grapheme ids (the
  reference fine-tunes mT5; here a native flax encoder-decoder, or an
  HF torch model via cat_tpu.models.pretrained for weight import).
- DANP: replicate each utterance across K noisy phoneme hypotheses
  from a frozen S2P model (beam n-best or sampling), train with CE.
- TKM (top-K marginalized, forward_MT5ForConditionalGeneration.py's
  loss_reduction/T_weight): loss = −log Σ_k softmax_k(s_k/T)·p(y|x_k),
  with s_k the S2P scores of the K candidates. SKM is TKM with sampled
  candidates instead of beam n-best (temperature at generation time).

All losses are jit-able with static shapes: candidates arrive as a
dense (N, K, Tp) tensor, the model runs once on the flattened
(N·K, Tp) batch, and the marginalization is a logsumexp over K.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from cat_tpu.models.decoders import TransformerDecoder
from cat_tpu.models.encoders import EmbeddingEncoder
from cat_tpu.utils.manager import TrainState


class P2GSeq2Seq(nn.Module):
    """Encoder-decoder P2G: phoneme tokens → grapheme logits.

    encoder: bidirectional conformer-cell token encoder
    (EmbeddingEncoder, encoder.py:465-495 equivalent);
    decoder: causal transformer with cross-attention."""

    src_vocab: int
    tgt_vocab: int
    hdim: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    num_heads: int = 4
    ff_dim: int = 1024
    dropout_rate: float = 0.1

    def setup(self):
        self.encoder = EmbeddingEncoder(
            vocab_size=self.src_vocab, num_cells=self.enc_layers,
            hdim=self.hdim, num_heads=self.num_heads,
            dropout_rate=self.dropout_rate, with_head=False)
        self.decoder = TransformerDecoder(
            vocab_size=self.tgt_vocab, hdim=self.hdim,
            num_layers=self.dec_layers, num_heads=self.num_heads,
            ff_dim=self.ff_dim, num_classes=self.tgt_vocab,
            dropout_rate=self.dropout_rate, causal=True)

    def encode(self, src, src_lens, deterministic=True):
        memory, _ = self.encoder(src, src_lens, deterministic)
        return memory

    def decode(self, tgt_in, tgt_lens, memory, memory_lengths,
               deterministic=True):
        logits, _ = self.decoder(tgt_in, tgt_lens, memory=memory,
                                 memory_lengths=memory_lengths,
                                 deterministic=deterministic)
        return logits

    def __call__(self, src, src_lens, tgt_in, tgt_lens,
                 deterministic=True):
        memory = self.encode(src, src_lens, deterministic)
        logits, _ = self.decoder(tgt_in, tgt_lens, memory=memory,
                                 memory_lengths=src_lens,
                                 deterministic=deterministic)
        return logits


def build_model(cfg: dict, src_vocab: int, tgt_vocab: int):
    kw = dict(cfg.get("p2g", {}).get("kwargs", {}))
    return P2GSeq2Seq(src_vocab=src_vocab, tgt_vocab=tgt_vocab, **kw)


def seq_logp(logits, tgt_out, tgt_lens):
    """Per-sequence Σ_u log p(y_u) with length masking. (N, U, V) → (N,)"""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(
        lp, tgt_out[..., None].astype(jnp.int32), axis=-1)[..., 0]
    U = tgt_out.shape[-1]
    mask = jnp.arange(U)[None, :] < tgt_lens[:, None]
    return jnp.sum(jnp.where(mask, tok_lp, 0.0), axis=-1)


def tkm_loss(model, params, cands, cand_lens, cand_scores, tgt_in,
             tgt_out, tgt_lens, rng=None, t_weight: float = 1.0,
             train=False):
    """Top-K marginalized NLL.

    cands: (N, K, Tp) phoneme candidates; cand_scores: (N, K) S2P
    log-scores (−inf or very negative for padding candidates);
    tgt_*: (N, U). Returns per-sequence −log Σ_k w_k p(y|x_k)."""
    N, K, Tp = cands.shape
    U = tgt_in.shape[-1]
    flat = lambda a: a.reshape((N * K,) + a.shape[2:])
    rep = lambda a: jnp.repeat(a, K, axis=0)
    logits = model.apply(
        params, flat(cands), flat(cand_lens), rep(tgt_in), rep(tgt_lens),
        deterministic=not train,
        rngs={"dropout": rng} if (train and rng is not None) else {})
    lps = seq_logp(logits, rep(tgt_out), rep(tgt_lens)).reshape(N, K)
    logw = jax.nn.log_softmax(cand_scores.astype(jnp.float32) / t_weight,
                              axis=-1)
    return -jax.scipy.special.logsumexp(logw + lps, axis=-1)


def init_state(model, tx, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    src = jnp.zeros((2, 12), jnp.int32)
    slens = jnp.asarray([12, 10], jnp.int32)
    tgt = jnp.zeros((2, 8), jnp.int32)
    tlens = jnp.asarray([8, 6], jnp.int32)
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, src, slens, tgt, tlens)
    params = variables["params"]
    return TrainState(params=params, batch_stats={},
                      opt_state=tx.init(params), step=jnp.asarray(0))


def batch_to_step(batch, bos=0, eos=0):
    """Seq2SeqBatch → train/eval-step payload: shift targets and append
    <eos> (bos/eos = 0, the tokenizers' reserved id). Host-side, cheap
    int ops (the pipeline's Manager batch_transform for this task)."""
    B, U = batch.tgt.shape
    tgt_in = np.concatenate(
        [np.full((B, 1), bos, np.int32), batch.tgt], axis=1)
    tgt_out = np.concatenate(
        [batch.tgt, np.zeros((B, 1), np.int32)], axis=1)
    if eos != 0:
        tgt_out[np.arange(B), batch.tgt_lens] = eos
    d = dict(src=batch.src, src_lens=batch.src_lens, tgt_in=tgt_in,
             tgt_out=tgt_out, tgt_lens=batch.tgt_lens + 1,
             weight=batch.weight)
    if batch.cands is not None:
        d.update(cands=batch.cands, cand_lens=batch.cand_lens,
                 cand_scores=batch.cand_scores)
    return d


def make_per_seq_fn(model, mode="ce", t_weight=1.0, label_smoothing=0.0):
    """Returns per_seq(params, batch, rng, train) → (N,) NLL."""

    def per_seq_fn(params, batch, rng, train):
        if mode in ("tkm", "skm"):
            return tkm_loss(model, params, batch["cands"],
                            batch["cand_lens"], batch["cand_scores"],
                            batch["tgt_in"], batch["tgt_out"],
                            batch["tgt_lens"], rng, t_weight,
                            train=train)
        logits = model.apply(
            params, batch["src"], batch["src_lens"], batch["tgt_in"],
            batch["tgt_lens"], deterministic=not train,
            rngs={"dropout": rng} if train else {})
        if train and label_smoothing > 0:
            V = logits.shape[-1]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            onehot = jax.nn.one_hot(batch["tgt_out"], V)
            soft = (onehot * (1 - label_smoothing)
                    + label_smoothing / V)
            tok_nll = -jnp.sum(soft * lp, axis=-1)
            U = batch["tgt_out"].shape[-1]
            mask = (jnp.arange(U)[None, :]
                    < batch["tgt_lens"][:, None])
            return jnp.sum(jnp.where(mask, tok_nll, 0.0), -1)
        return -seq_logp(logits, batch["tgt_out"], batch["tgt_lens"])

    return per_seq_fn


def make_train_step(model, tx, mode="ce", t_weight=1.0,
                    label_smoothing=0.0, grad_clip=5.0):
    """mode 'ce': batch {src, src_lens, tgt_in, tgt_out, tgt_lens,
    weight}; mode 'tkm': batch {cands, cand_lens, cand_scores, tgt_in,
    tgt_out, tgt_lens, weight}."""
    per_seq_fn = make_per_seq_fn(model, mode, t_weight, label_smoothing)

    def loss_fn(params, batch, rng):
        per_seq = per_seq_fn({"params": params}, batch, rng, True)
        w = batch["weight"]
        return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                  rng)
        gnorm = optax.global_norm(grads)
        if grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        from cat_tpu.ctc.train import set_lr
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), \
            {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_eval_step(model, mode="ce", t_weight=1.0):
    per_seq_fn = make_per_seq_fn(model, mode, t_weight, 0.0)

    @jax.jit
    def eval_step(state: TrainState, batch):
        per_seq = per_seq_fn({"params": state.params}, batch,
                             jax.random.PRNGKey(0), False)
        w = batch["weight"]
        return {"loss_sum": jnp.sum(per_seq * w), "count": jnp.sum(w)}

    return eval_step


def danp_expand(utterances, nbest, k=None):
    """DANP: one training example per (noisy phoneme hyp, transcript).

    utterances: iterable of (uid, grapheme_ids); nbest: {uid: [(score,
    phoneme_ids), ...]} from S2P beam search or sampling. Returns a list
    of (uid, phoneme_ids, grapheme_ids) replicated over up to k hyps —
    the offline augmentation of egs/llm-p2g DANP."""
    out = []
    for uid, gids in utterances:
        hyps = nbest.get(uid, [])
        if k is not None:
            hyps = sorted(hyps, key=lambda x: -x[0])[:k]
        for _, pids in hyps:
            out.append((uid, list(pids), list(gids)))
    return out


from functools import lru_cache


@lru_cache(maxsize=None)
def _gen_fn(model, bos, eos, max_len):
    """One compiled generator per (model, bos, eos, max_len): flax
    modules hash by structure, so repeated calls hit the jit cache
    instead of retracing per batch."""

    @jax.jit
    def run(params, src, src_lens):
        N = src.shape[0]
        memory = model.apply(params, src, src_lens,
                             method=P2GSeq2Seq.encode)
        tokens = jnp.full((N, max_len + 1), bos, jnp.int32)
        done = jnp.zeros((N,), bool)

        def body(carry, u):
            tokens, done = carry
            logits = model.apply(
                params, tokens[:, :-1], None, memory, src_lens,
                method=P2GSeq2Seq.decode)
            nxt = jnp.argmax(logits[jnp.arange(N), u], axis=-1)
            nxt = jnp.where(done, eos, nxt).astype(jnp.int32)
            done = done | (nxt == eos)
            tokens = tokens.at[:, u + 1].set(nxt)
            return (tokens, done), nxt

        (tokens, done), _ = jax.lax.scan(body, (tokens, done),
                                         jnp.arange(max_len))
        out = tokens[:, 1:]
        is_eos = out == eos
        lengths = jnp.where(is_eos.any(1), jnp.argmax(is_eos, 1),
                            max_len)
        return out, lengths.astype(jnp.int32)

    return run


def greedy_generate(model, params, src, src_lens, bos=0, eos=0,
                    max_len=64):
    """Batched greedy autoregressive generation under one jit scan.

    Returns (tokens (N, max_len), lengths). eos terminates a row."""
    return _gen_fn(model, bos, eos, max_len)(params, src, src_lens)


@lru_cache(maxsize=None)
def _rescore_fn(model, bos, t_weight):
    @jax.jit
    def run(params, cands, cand_lens, cand_scores, hyps, hyp_lens):
        N, J, U = hyps.shape
        tgt_in = jnp.concatenate(
            [jnp.full((N, J, 1), bos, hyps.dtype), hyps[..., :-1]], -1)
        scores = []
        for j in range(J):  # J is static: unrolled under one jit
            nll = tkm_loss(model, params, cands, cand_lens, cand_scores,
                           tgt_in[:, j], hyps[:, j], hyp_lens[:, j],
                           t_weight=t_weight)
            scores.append(-nll)
        return jnp.stack(scores, axis=1)  # (N, J)

    return run


def marginalized_rescore(model, params, cands, cand_lens, cand_scores,
                         hyps, hyp_lens, bos=0, t_weight=1.0):
    """TKM decoding rescoring pass: score each grapheme hypothesis y_j
    by log Σ_k w_k p(y_j | x_k) (egs/llm-p2g TKM decoding; read_nbest.py
    marginal scoring). hyps: (N, J, U) token ids (no bos)."""
    return _rescore_fn(model, bos, float(t_weight))(
        params, cands, cand_lens, cand_scores, hyps, hyp_lens)
