"""Chunk-ME2E (streaming multichannel) trainer + decode_me2e +
beamformer mode variants — the reference's train_me2e_chunk.py /
decode_me2e.py / dnn_beamformer.py:218 depth (VERDICT round-1 item 10).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ctc import train_me2e_chunk
from cat_tpu.utils.scheduler import build_scheduler

SR = 8000
V = 4
C = 2
L = 2400


def tiny_cfg(beamformer_type="mvdr"):
    return {
        "frontend": {"kwargs": {"num_bins": 20, "sample_rate": SR,
                                "frame_length": 200, "frame_shift": 80,
                                "fft_size": 256, "mask_hidden": 8,
                                "beamformer_type": beamformer_type}},
        "encoder": {"type": "LSTM",
                    "kwargs": {"hdim": 16, "num_layers": 1,
                               "bidirectional": True,
                               "dropout_rate": 0.0}},
        "unified": {"chunk": 8, "left_context": 8, "right_context": 4,
                    "simu_hidden": 8},
    }


def make_batch(rng, N=4):
    wave = np.zeros((N, C, L), np.float32)
    labels = np.zeros((N, 2), np.int32)
    llen = np.zeros((N,), np.int32)
    for n in range(N):
        nw = int(rng.integers(1, 3))
        t0 = 200
        for u in range(nw):
            v = int(rng.integers(1, V))
            labels[n, u] = v
            tt = np.arange(800) / SR
            tone = 0.3 * np.sin(2 * np.pi * 300.0 * v * tt)
            for c in range(C):
                wave[n, c, t0:t0 + 800] += tone.astype(np.float32)
            t0 += 1000
        llen[n] = nw
        wave[n] += rng.standard_normal((C, L)).astype(np.float32) * 0.02
    return dict(feats=jnp.asarray(wave),
                feat_lengths=jnp.full((N,), L, jnp.int32),
                labels=jnp.asarray(labels),
                label_lengths=jnp.asarray(llen),
                weight=jnp.ones((N,), jnp.float32))


def build(beamformer_type="mvdr"):
    cfg = tiny_cfg(beamformer_type)
    model = train_me2e_chunk.build_model(cfg, num_classes=V)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 100000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 3e-3}}})
    state = train_me2e_chunk.init_state(model, tx, num_channels=C,
                                        num_samples=L)
    return model, tx, state


def test_chunk_me2e_trains():
    rng = np.random.default_rng(0)
    model, tx, state = build()
    step = train_me2e_chunk.make_train_step(model, tx, future="simu")
    ev = train_me2e_chunk.make_eval_step(model)
    b0 = make_batch(rng)
    first = float(ev(state, b0)["loss_sum"])
    key = jax.random.PRNGKey(0)
    m = {}
    for i in range(25):
        key, sub = jax.random.split(key)
        state, m = step(state, make_batch(rng) if i % 3 == 0 else b0,
                        jnp.float32(3e-3), sub)
    last = float(ev(state, b0)["loss_sum"])
    assert np.isfinite(last) and last < first, (first, last)
    # joint objective exposes both loss tracks + simu regression
    for k in ("utt_loss", "chunk_loss", "simu_l1"):
        assert np.isfinite(float(m[k])), k
    assert float(m["skipped"]) == 0.0

    # streaming inference path: bf_chunk_infer shapes line up with the
    # full-context forward
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logits, olens = train_me2e_chunk.bf_chunk_infer(
        model, variables, b0["feats"], b0["feat_lengths"])
    full_logits, full_lens = model.apply(
        variables, b0["feats"], b0["feat_lengths"], deterministic=True,
        method=model.full_forward)
    assert logits.shape[0] == full_logits.shape[0]
    assert logits.shape[2] == full_logits.shape[2] == V
    assert np.all(np.asarray(olens) >= np.asarray(full_lens) - 1)


def test_decode_me2e_offline_and_streaming():
    rng = np.random.default_rng(1)
    model, tx, state = build()
    from cat_tpu.ctc.decode_me2e import decode_scp, make_me2e_decoder

    b = make_batch(rng, N=2)
    for mode in ("offline", "streaming"):
        dec = make_me2e_decoder(model, state.params, state.batch_stats,
                                mode=mode, beam_width=3)
        res = dec(np.asarray(b["feats"]),
                  np.asarray(b["feat_lengths"]), nbest=2, max_len=8)
        assert len(res) == 2
        for nb in res:
            assert 1 <= len(nb) <= 2
            for score, toks in nb:
                assert np.isfinite(score)
                assert all(0 < t < V for t in toks)

    class _Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    utts = [(f"u{i}", np.asarray(b["feats"])[i]) for i in range(2)]
    hyps, rtf = decode_scp(model, state.params, utts, _Tok(),
                           batch_stats=state.batch_stats, beam_width=1)
    assert set(hyps) == {"u0", "u1"} and rtf > 0


@pytest.mark.parametrize("btype", ["mpdr", "gev"])
def test_beamformer_modes(btype):
    """New beamformer types produce finite, trainable features."""
    rng = np.random.default_rng(2)
    model, tx, state = build(btype)
    b = make_batch(rng)
    ev = train_me2e_chunk.make_eval_step(model)
    first = float(ev(state, b)["loss_sum"])
    assert np.isfinite(first)
    step = train_me2e_chunk.make_train_step(model, tx)
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, m = step(state, b, jnp.float32(3e-3), sub)
    last = float(ev(state, b)["loss_sum"])
    assert np.isfinite(last) and last < first, (btype, first, last)
