"""HuggingFace import integrations (optional; no-network environments
get clear errors instead of silent downloads).

Counterparts of the reference's HF integrations: Wav2Vec2Encoder
(/root/reference/cat/shared/encoder.py:405-462 — a real AbsEncoder that
fine-tunes the wav2vec2 trunk under an encoder head), the
PretrainedTransformer / CausalTransformer HF variants
(cat/shared/decoder.py:244-335) and PretrainedTokenizer
(cat/shared/tokenizer.py HF path).

TPU design: the wav2vec2 trunk is composed as a flax.linen submodule
inside our own encoder module, so the whole model — conv feature
extractor, transformer, projection, classifier head — is one jittable,
differentiable program. Fine-tuning therefore runs in the same SPMD
train step as every other encoder (the reference wraps the HF torch
model and round-trips features; here the trunk's params live in the
ordinary param tree and shard/checkpoint like any other encoder's).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class PretrainedTokenizer:
    """Wraps a HF tokenizer behind the AbsTokenizer interface."""

    def __init__(self, name_or_path):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(name_or_path)

    @property
    def vocab_size(self):
        return self._tok.vocab_size

    def encode(self, text):
        if isinstance(text, str):
            return self._tok.encode(text, add_special_tokens=False)
        return [self._tok.encode(t, add_special_tokens=False)
                for t in text]

    def decode(self, ids):
        if ids and isinstance(ids[0], (list, tuple)):
            return [self._tok.decode(i) for i in ids]
        return self._tok.decode(ids)


class Wav2Vec2Encoder(nn.Module):
    """Trainable wav2vec2 acoustic encoder (encoder.py:405-462 role):
    raw waveform → wav2vec2 trunk (flax, fine-tunable or frozen) →
    optional projection → classifier head.

    Config-selectable like every encoder:
      {"type": "Wav2Vec2Encoder", "kwargs": {
          "pretrained": "/path/to/local/hf/dir",   # config source
          "freeze": false, "freeze_feature_encoder": true, ...}}
    or, for from-scratch / test models, explicit Wav2Vec2Config kwargs
    via "w2v2_config". Pretrained weights are grafted into the param
    tree with load_wav2vec2_params() after init (no network access —
    requires a local checkpoint directory, like the reference's
    `use_wav2vec2` path requires a downloaded model).

    Takes (waveform (N, S) or (N, S, 1), lengths) and returns
    (logits/features, out_lengths), matching the AbsEncoder contract.
    """

    num_classes: int = 0
    # local HF checkpoint dir — used for the *config*; weights are
    # loaded separately by load_wav2vec2_params (init stays cheap)
    pretrained: Optional[str] = None
    # explicit Wav2Vec2Config kwargs (tiny models, tests)
    w2v2_config: Optional[dict] = None
    # freeze the whole trunk (feature-extraction mode): params stay in
    # the tree but receive zero grads via stop_gradient
    freeze: bool = False
    # freeze only the conv feature encoder (the reference's usual
    # fine-tuning setup)
    freeze_feature_encoder: bool = True
    proj_dim: int = 0
    with_head: bool = True
    dtype: Any = jnp.float32

    def _config(self):
        from transformers import Wav2Vec2Config

        if self.pretrained:
            return Wav2Vec2Config.from_pretrained(self.pretrained)
        kw = dict(self.w2v2_config or {})
        # the flax port only implements the stable-layer-norm variant
        kw.setdefault("do_stable_layer_norm", True)
        kw.setdefault("feat_extract_norm", "layer")
        return Wav2Vec2Config(**kw)

    @nn.compact
    def __call__(self, wave, lengths, deterministic=True):
        from transformers.models.wav2vec2.modeling_flax_wav2vec2 import (
            FlaxWav2Vec2Module)

        cfg = self._config()
        if wave.ndim == 3 and wave.shape[-1] == 1:
            wave = wave[..., 0]
        mask = (jnp.arange(wave.shape[1])[None, :]
                < lengths[:, None]).astype(jnp.int32)
        trunk = FlaxWav2Vec2Module(config=cfg, dtype=self.dtype,
                                   name="wav2vec2")
        out = trunk(wave.astype(self.dtype), attention_mask=mask,
                    deterministic=deterministic,
                    freeze_feature_encoder=(self.freeze
                                            or self.freeze_feature_encoder),
                    return_dict=True)
        h = out.last_hidden_state
        if self.freeze:
            h = jax.lax.stop_gradient(h)
        out_lens = lengths
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            out_lens = (out_lens - k) // s + 1
        out_lens = jnp.maximum(out_lens, 1)
        if self.proj_dim:
            h = nn.Dense(self.proj_dim, dtype=self.dtype,
                         name="proj")(h)
            h = nn.tanh(h)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, out_lens


def load_wav2vec2_params(params, name_or_path):
    """Graft pretrained HF wav2vec2 weights into an initialized
    Wav2Vec2Encoder param tree (the reference loads the torch state
    dict inside Wav2Vec2Encoder.__init__; here weights are explicit
    data, so the graft is a pure-tree operation that composes with
    checkpointing and sharding).

    params: the "params" collection from model.init(...).
    Returns a new tree with params["wav2vec2"] replaced."""
    from transformers import FlaxWav2Vec2Model

    hf = FlaxWav2Vec2Model.from_pretrained(name_or_path)
    new = dict(params)
    new["wav2vec2"] = jax.tree.map(jnp.asarray, hf.params)
    return new
