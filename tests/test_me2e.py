"""ME2E multichannel task: joint beamformer+AM training reduces loss."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ctc import train_me2e
from cat_tpu.utils.data import (SpeechDataset, WeightedConcatDataset,
                                pack_speech_data)
from cat_tpu.utils.scheduler import build_scheduler


def test_me2e_trains():
    rng = np.random.default_rng(0)
    N, C, L, V = 4, 2, 2400, 4
    sr = 8000
    cfg = {
        "frontend": {"kwargs": {"num_bins": 20, "sample_rate": sr,
                                "frame_length": 200, "frame_shift": 80,
                                "fft_size": 256, "mask_hidden": 8}},
        "encoder": {"type": "LSTM",
                    "kwargs": {"hdim": 16, "num_layers": 1,
                               "bidirectional": True,
                               "dropout_rate": 0.0}},
    }
    model = train_me2e.build_model(cfg, num_classes=V)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 100000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 3e-3}}})
    state = train_me2e.init_state(model, tx, num_channels=C,
                                  num_samples=L)

    # synthetic: word v = tone at v*300 Hz reaching both mics in phase
    def make_batch():
        wave = np.zeros((N, C, L), np.float32)
        labels = np.zeros((N, 2), np.int32)
        llen = np.zeros((N,), np.int32)
        for n in range(N):
            nw = int(rng.integers(1, 3))
            t0 = 200
            for u in range(nw):
                v = int(rng.integers(1, V))
                labels[n, u] = v
                tt = np.arange(800) / sr
                tone = 0.3 * np.sin(2 * np.pi * 300.0 * v * tt)
                for c in range(C):
                    wave[n, c, t0:t0 + 800] += tone.astype(np.float32)
                t0 += 1000
            llen[n] = nw
            wave[n] += rng.standard_normal((C, L)).astype(
                np.float32) * 0.02
        return dict(feats=jnp.asarray(wave),
                    feat_lengths=jnp.full((N,), L, jnp.int32),
                    labels=jnp.asarray(labels),
                    label_lengths=jnp.asarray(llen),
                    weight=jnp.ones((N,), jnp.float32))

    step = train_me2e.make_train_step(model, tx)
    ev = train_me2e.make_eval_step(model)
    b0 = make_batch()
    first = float(ev(state, b0)["loss_sum"])
    key = jax.random.PRNGKey(0)
    for i in range(25):
        key, sub = jax.random.split(key)
        state, m = step(state, make_batch() if i % 3 == 0 else b0,
                        jnp.float32(3e-3), sub)
    last = float(ev(state, b0)["loss_sum"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert m["skipped"] == 0.0


def test_weighted_concat_dataset(tmp_path):
    rng = np.random.default_rng(1)

    def mk(name, n):
        utts = [(f"{name}{i}",
                 rng.standard_normal((20, 4)).astype(np.float32),
                 [1, 2]) for i in range(n)]
        pack_speech_data(str(tmp_path / name), utts)
        return SpeechDataset(str(tmp_path / name))

    d1, d2 = mk("a", 10), mk("b", 30)
    wc = WeightedConcatDataset([d1, d2], weights=[3.0, 1.0])
    assert len(wc) == 40
    f, l = wc[5]
    assert f.shape == (20, 4)
    f, l = wc[15]  # from d2
    assert wc.frame_length(15) == 20
    idxs = wc.sample_indices(np.random.default_rng(0), 400)
    frac_d1 = np.mean(idxs < 10)
    assert 0.6 < frac_d1 < 0.9  # ~0.75 expected


def test_weighted_concat_through_bucketed_loader(tmp_path):
    """Pipeline wiring: BucketedLoader honors WeightedConcatDataset's
    sampling weights (multi-trset training reaches the train loop, not
    just the ops layer)."""
    from cat_tpu.utils.data import BucketedLoader

    rng = np.random.default_rng(2)

    def mk(name, n):
        utts = [(f"{name}{i}",
                 rng.standard_normal((24, 4)).astype(np.float32),
                 [1, 2]) for i in range(n)]
        pack_speech_data(str(tmp_path / name), utts)
        return SpeechDataset(str(tmp_path / name))

    d1, d2 = mk("a", 16), mk("b", 16)
    wc = WeightedConcatDataset([d1, d2], weights=[1.0, 0.0])
    loader = BucketedLoader(wc, frame_budget=200, num_buckets=1,
                            shuffle=True, seed=0)
    seen = []
    for batch in loader.epoch(1):
        w = np.asarray(batch.asdict()["weight"])
        for j, uid in enumerate(batch.uids):
            if w[j] > 0:
                seen.append(uid)
    assert seen and all(u.startswith("a") for u in seen), seen[:5]


def test_me2e_kaldi_framing_matches_log_fbank():
    """kaldi_framing + no_enhance on 1 channel == ops/fbank.log_fbank.

    The kaldi variant's feature chain (cat/ctc/train_me2e_kaldi.py:
    Feature_Trans with dither=0 + ChannelSelector) must reduce to the
    offline kaldi fbank when no enhancement is applied."""
    from cat_tpu.front.beamformer import BeamformerNet
    from cat_tpu.ops.fbank import log_fbank

    rng = np.random.default_rng(1)
    N, L = 2, 2000
    wave = rng.standard_normal((N, L)).astype(np.float32)
    net = BeamformerNet(num_bins=23, sample_rate=8000, frame_length=200,
                        frame_shift=80, fft_size=256,
                        kaldi_framing=True, no_enhance=True)
    vars_ = net.init(jax.random.PRNGKey(0), wave[:, None, :],
                     jnp.full((N,), L, jnp.int32))
    assert not vars_.get("params"), "noSE path must be parameter-free"
    feats, flens = net.apply(vars_, wave[:, None, :],
                             jnp.full((N,), L, jnp.int32))
    ref = log_fbank(jnp.asarray(wave), num_bins=23, sample_rate=8000,
                    frame_length=200, frame_shift=80, fft_size=256)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert int(flens[0]) == ref.shape[1]


def test_me2e_kaldi_trainer_builds_and_steps():
    """train_me2e_kaldi: kaldi framing default-on, noSE honored, one
    train step runs with finite loss and grads reach the beamformer."""
    from cat_tpu.ctc import train_me2e_kaldi

    cfg = {
        "frontend": {"kwargs": {"num_bins": 20, "sample_rate": 8000,
                                "frame_length": 200, "frame_shift": 80,
                                "fft_size": 256, "mask_hidden": 8}},
        "encoder": {"type": "LSTM",
                    "kwargs": {"hdim": 16, "num_layers": 1,
                               "bidirectional": True,
                               "dropout_rate": 0.0}},
    }
    model = train_me2e_kaldi.build_model(cfg, num_classes=4)
    assert model.frontend.kaldi_framing
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 100000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = train_me2e_kaldi.init_state(model, tx, num_channels=2,
                                        num_samples=1600)
    rng = np.random.default_rng(2)
    batch = dict(
        feats=jnp.asarray(rng.standard_normal((2, 2, 1600)),
                          jnp.float32),
        feat_lengths=jnp.full((2,), 1600, jnp.int32),
        labels=jnp.asarray([[1, 2], [3, 0]], jnp.int32),
        label_lengths=jnp.asarray([2, 1], jnp.int32),
        weight=jnp.ones((2,), jnp.float32))
    step = train_me2e_kaldi.make_train_step(model, tx)
    state, m = step(state, batch, jnp.float32(1e-3),
                    jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    # noSE spelled the reference way builds the parameter-free frontend
    cfg2 = {**cfg, "frontend": {"kwargs": {
        **cfg["frontend"]["kwargs"], "noSE": True}}}
    m2 = train_me2e_kaldi.build_model(cfg2, num_classes=4)
    assert m2.frontend.no_enhance
