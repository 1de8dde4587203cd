"""Decoders: RNN-T predictors and neural LMs (flax.linen).

Counterparts of /root/reference/cat/shared/decoder.py: AbsDecoder
(:19-121 — embedding + optional tied classifier + score()), LSTM predictor
(:129-199), Embedding decoder (:202-241), CausalTransformer (:244-335),
ZeroDecoder (:630-657). The n-gram scorer equivalent (NGram,
decoder.py:516-627) lives in cat_tpu.fst.ngram (host-side); MultiDecoder /
ILM fusion weights are applied at beam-search time.

API: __call__(tokens, lengths) -> (hidden_or_logits, lengths) for full
sequences; `init_state(batch)` + `step(params-bound module, tokens, state)`
for incremental decoding.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _lstm_step(params, carry, x):
    """Standard LSTM cell on explicit params {wx, wh, b}."""
    c, h = carry
    gates = x @ params["wx"] + h @ params["wh"] + params["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (c, h), h


class LSTMPredictor(nn.Module):
    """Embedding → LSTM stack → optional head (decoder.py:129-199).

    The LSTM cell uses explicit parameters so the full-sequence pass is a
    lax.scan over the SAME step function used for incremental decoding —
    bit-identical full vs. step outputs by construction."""

    vocab_size: int
    hdim: int = 640
    num_layers: int = 1
    edim: int = 0  # embedding dim; 0 → hdim
    num_classes: int = 0  # with head → LM mode
    dropout_rate: float = 0.0
    with_head: bool = False
    tied: bool = False
    # char→syllable converter (static tuple) enables the syllable-
    # enhanced variant (decoder.py:796-834 SyllableEnhancedLSTM)
    syllable_converter: Optional[tuple] = None

    def setup(self):
        edim = self.edim or self.hdim
        self.embed = nn.Embed(self.vocab_size, edim)
        if self.syllable_converter is not None:
            n_syl = max(self.syllable_converter) + 1
            self.syl_embed = nn.Embed(n_syl, edim)
        layers = []
        glorot = nn.initializers.xavier_uniform()
        ortho = nn.initializers.orthogonal()
        for i in range(self.num_layers):
            in_dim = edim if i == 0 else self.hdim
            layers.append({
                "wx": self.param(f"lstm_{i}_wx", glorot,
                                 (in_dim, 4 * self.hdim)),
                "wh": self.param(f"lstm_{i}_wh", ortho,
                                 (self.hdim, 4 * self.hdim)),
                "b": self.param(f"lstm_{i}_b", nn.initializers.zeros,
                                (4 * self.hdim,)),
            })
        self.layers = layers
        if self.with_head and self.num_classes > 0 and not self.tied:
            self.classifier = nn.Dense(self.num_classes)

    def _head(self, h):
        if not (self.with_head and self.num_classes > 0):
            return h
        if self.tied:
            return h @ self.embed.embedding.T
        return self.classifier(h)

    def _embed(self, tokens):
        tokens = tokens.astype(jnp.int32)
        x = self.embed(tokens)
        if self.syllable_converter is not None:
            conv = jnp.asarray(self.syllable_converter, jnp.int32)
            x = x + self.syl_embed(conv[tokens])
        return x

    def __call__(self, tokens, lengths=None, deterministic=True):
        x = self._embed(tokens)
        N, U = tokens.shape
        for i, lp in enumerate(self.layers):
            carry = (jnp.zeros((N, self.hdim), x.dtype),
                     jnp.zeros((N, self.hdim), x.dtype))
            xs = jnp.swapaxes(x, 0, 1)  # (U, N, D)
            _, hs = jax.lax.scan(
                lambda c, xt: _lstm_step(lp, c, xt), carry, xs)
            x = jnp.swapaxes(hs, 0, 1)
            if self.dropout_rate > 0 and i < self.num_layers - 1:
                x = nn.Dropout(self.dropout_rate)(
                    x, deterministic=deterministic)
        return self._head(x), lengths

    def init_state(self, batch_size):
        zeros = lambda: (jnp.zeros((batch_size, self.hdim)),
                         jnp.zeros((batch_size, self.hdim)))
        return tuple(zeros() for _ in range(self.num_layers))

    def step(self, tokens, state):
        """One decode step. tokens (N,) → (out (N,D), new_state)."""
        x = self._embed(tokens)
        new_state = []
        for lp, st in zip(self.layers, state):
            st, x = _lstm_step(lp, st, x)
            new_state.append(st)
        return self._head(x), tuple(new_state)


class Embedding(nn.Module):
    """Context-1 embedding predictor (decoder.py:202-241)."""

    vocab_size: int
    hdim: int = 256
    num_classes: int = 0
    with_head: bool = False

    @nn.compact
    def __call__(self, tokens, lengths=None, deterministic=True):
        h = nn.Embed(self.vocab_size, self.hdim)(tokens.astype(jnp.int32))
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes)(h)
        return h, lengths

    def init_state(self, batch_size):
        return ()

    def step(self, tokens, state):
        h, _ = self(tokens[:, None])
        return h[:, 0], state


class CausalTransformer(nn.Module):
    """Causal transformer LM/predictor (decoder.py:244-335, GPT-2 style).

    Native implementation (no HF dependency): learned positions, pre-LN
    blocks, causal mask, optional tied softmax head."""

    vocab_size: int
    hdim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ff_dim: int = 2048
    max_len: int = 2048
    num_classes: int = 0
    dropout_rate: float = 0.1
    with_head: bool = True
    tied: bool = True

    @nn.compact
    def __call__(self, tokens, lengths=None, deterministic=True):
        N, U = tokens.shape
        embed = nn.Embed(self.vocab_size, self.hdim, name="embed")
        h = embed(tokens.astype(jnp.int32))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.hdim))
        h = h + pos[None, :U]
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((U, U), bool))
        if lengths is not None:
            valid = jnp.arange(U)[None, :] < lengths[:, None]
            mask = causal[None, None] & valid[:, None, None, :]
        else:
            mask = causal[None, None]
        for i in range(self.num_layers):
            a = nn.LayerNorm(name=f"ln1_{i}")(h)
            a = nn.SelfAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                name=f"attn_{i}")(a, mask=mask)
            h = h + a
            f = nn.LayerNorm(name=f"ln2_{i}")(h)
            f = nn.Dense(self.ff_dim, name=f"ff1_{i}")(f)
            f = nn.gelu(f)
            f = nn.Dense(self.hdim, name=f"ff2_{i}")(f)
            f = nn.Dropout(self.dropout_rate)(f,
                                              deterministic=deterministic)
            h = h + f
        h = nn.LayerNorm(name="ln_f")(h)
        if self.with_head and self.num_classes > 0:
            if self.tied and self.num_classes == self.vocab_size:
                h = h @ embed.embedding.T
            else:
                h = nn.Dense(self.num_classes, name="head")(h)
        return h, lengths


class TransformerDecoder(nn.Module):
    """BERT-style transformer with optional cross-attention, used as the
    P2G/LLM-P2G decoder (encoder.py:581-639 TransformerDecoder). When
    `memory` is given, each layer attends to it (encoder-decoder mode);
    otherwise it is a bidirectional transformer encoder over tokens."""

    vocab_size: int
    hdim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ff_dim: int = 2048
    max_len: int = 2048
    num_classes: int = 0
    dropout_rate: float = 0.1
    with_head: bool = True
    causal: bool = False  # autoregressive mode (LLM-P2G decoder)

    @nn.compact
    def __call__(self, tokens, lengths=None, memory=None,
                 memory_lengths=None, deterministic=True):
        N, U = tokens.shape
        h = nn.Embed(self.vocab_size, self.hdim, name="embed")(
            tokens.astype(jnp.int32))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.hdim))
        h = h + pos[None, :U]
        if lengths is not None:
            valid = jnp.arange(U)[None, :] < lengths[:, None]
            self_mask = (valid[:, None, None, :]
                         & valid[:, None, :, None])
        else:
            self_mask = None
        if self.causal:
            tri = jnp.tril(jnp.ones((U, U), bool))[None, None]
            self_mask = tri if self_mask is None else (self_mask & tri)
        if memory is not None and memory_lengths is not None:
            mvalid = (jnp.arange(memory.shape[1])[None, :]
                      < memory_lengths[:, None])
            cross_mask = mvalid[:, None, None, :]
        else:
            cross_mask = None
        for i in range(self.num_layers):
            a = nn.LayerNorm(name=f"ln1_{i}")(h)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                name=f"self_{i}")(a, a, mask=self_mask)
            h = h + a
            if memory is not None:
                c = nn.LayerNorm(name=f"lnx_{i}")(h)
                c = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads,
                    dropout_rate=self.dropout_rate,
                    deterministic=deterministic,
                    name=f"cross_{i}")(c, memory, mask=cross_mask)
                h = h + c
            f = nn.LayerNorm(name=f"ln2_{i}")(h)
            f = nn.gelu(nn.Dense(self.ff_dim, name=f"ff1_{i}")(f))
            f = nn.Dense(self.hdim, name=f"ff2_{i}")(f)
            f = nn.Dropout(self.dropout_rate)(
                f, deterministic=deterministic)
            h = h + f
        h = nn.LayerNorm(name="ln_f")(h)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="head")(h)
        return h, lengths


class ZeroDecoder(nn.Module):
    """Stateless zero predictor — decoder-free transducer
    (decoder.py:630-657)."""

    hdim: int = 1
    vocab_size: int = 0

    def __call__(self, tokens, lengths=None, deterministic=True):
        N, U = tokens.shape
        return jnp.zeros((N, U, self.hdim)), lengths

    def init_state(self, batch_size):
        return ()

    def step(self, tokens, state):
        return jnp.zeros((tokens.shape[0], self.hdim)), state


def SyllableEnhancedLSTM(vocab_size, syllable_converter, **kw):
    """Config-reflection alias (decoder.py:796-834): LSTM predictor whose
    embedding is char + syllable (layer.py SyllableEmbedding)."""
    return LSTMPredictor(vocab_size=vocab_size,
                         syllable_converter=tuple(syllable_converter),
                         **kw)
