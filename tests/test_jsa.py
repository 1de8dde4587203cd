"""JSA-SPG trainer: losses decrease, sampler caches, acceptance tracked."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ctc.train_jsa import JsaTrainer, build_models
from cat_tpu.utils.data import Batch
from cat_tpu.utils.scheduler import build_scheduler

P, G, F = 5, 4, 6  # phonemes (incl blank), graphemes (incl blank), feat


def make_batch(rng, B=4, T=40):
    # grapheme g maps to phoneme pair (g, g%2+1); speech = per-phoneme
    # 4-frame patterns
    feats = np.zeros((B, T, F), np.float32)
    labels = np.zeros((B, 4), np.int32)
    flen = np.zeros((B,), np.int32)
    llen = np.zeros((B,), np.int32)
    uids = []
    for n in range(B):
        ng = int(rng.integers(1, 4))
        t = 0
        for u in range(ng):
            gph = int(rng.integers(1, G))
            labels[n, u] = gph
            for ph in (gph, gph % 2 + 1):
                feats[n, t:t + 4, :] = ph
                t += 4
            feats[n, t:t + 2] = 0
            t += 2
        feats[n] += rng.standard_normal((T, F)).astype(np.float32) * 0.1
        flen[n] = min(t, T)
        llen[n] = ng
        uids.append(f"u{n}")
    return Batch(feats, flen, labels, llen, np.ones((B,), np.float32),
                 uids=uids)


def test_jsa_trainer_runs_and_improves():
    cfg = {
        "s2p": {"type": "LSTM",
                "kwargs": {"hdim": 16, "num_layers": 1,
                           "bidirectional": True, "dropout_rate": 0.0}},
        "p2g": {"type": "EmbeddingEncoder",
                "kwargs": {"num_cells": 1, "hdim": 16, "num_heads": 2,
                           "kernel_size": 3, "dropout_rate": 0.0}},
        "g2p": {"type": "EmbeddingEncoder",
                "kwargs": {"num_cells": 1, "hdim": 16, "num_heads": 2,
                           "kernel_size": 3, "dropout_rate": 0.0}},
    }
    s2p, p2g, g2p = build_models(cfg, num_phonemes=P, num_graphemes=G)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 100000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 3e-3}}})
    trainer = JsaTrainer(s2p, p2g, g2p, tx, feat_dim=F,
                         num_phonemes=P, num_graphemes=G,
                         num_samples=3, beam_width=4, upsample=3)
    rng = np.random.default_rng(0)
    batches = [make_batch(rng) for _ in range(2)]
    key = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(10):
        for b in batches:
            key, sub = jax.random.split(key)
            m = trainer.train_step(b, sub)
            losses.append(m["loss"])
    assert np.isfinite(m["loss"])
    # early-vs-late average (single-step JSA losses are noisy: the
    # sampled z changes between steps)
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    assert 0.0 < m["acceptance_rate"] <= 1.0
    assert len(trainer.sampler.cache) > 0


def test_jsa_supervised_substitution():
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
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 100000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 3e-3}}})
    trainer = JsaTrainer(s2p, p2g, g2p, tx, feat_dim=F,
                         num_phonemes=P, num_graphemes=G, upsample=3)
    rng = np.random.default_rng(1)
    b = make_batch(rng)
    # oracle z for supervised mode
    sup = {}
    for j, uid in enumerate(b.uids):
        y = b.labels[j, : b.label_lengths[j]]
        z = []
        for gph in y:
            z += [int(gph), int(gph) % 2 + 1]
        sup[uid] = z
    m = trainer.train_step(b, jax.random.PRNGKey(1), supervised_z=sup)
    assert np.isfinite(m["loss"])
