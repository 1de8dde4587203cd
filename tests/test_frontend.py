"""Tests for fbank frontend and SpecAug."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.fbank import (cmvn, log_fbank, mel_filterbank, num_frames,
                               speed_perturb_resample)
from cat_tpu.ops.specaug import specaug


def test_fbank_shapes_and_finite():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    feats = log_fbank(jnp.asarray(wav))
    assert feats.shape == (2, 1 + (16000 - 400) // 160, 80)
    assert np.all(np.isfinite(np.asarray(feats)))
    assert int(num_frames(16000)) == feats.shape[1]


def test_fbank_tone_peaks_at_right_mel_bin():
    # 1 kHz tone should put most energy near the 1 kHz mel bin
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)[None, :]
    feats = np.asarray(log_fbank(jnp.asarray(tone)))
    mean_spec = feats[0].mean(axis=0)
    peak_bin = int(mean_spec.argmax())
    # locate where 1 kHz falls in the mel filterbank
    fb = mel_filterbank(80, 512, sr)
    freq_of_bin = np.linspace(0, sr / 2, 257)
    expected_bin = int(np.argmax(fb[np.argmin(np.abs(freq_of_bin - 1000))]))
    assert abs(peak_bin - expected_bin) <= 2, (peak_bin, expected_bin)


def test_cmvn_zero_mean():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 30, 8)).astype(np.float32) + 3.0)
    lengths = jnp.asarray(np.array([30, 20], np.int32))
    out = np.asarray(cmvn(x, lengths))
    np.testing.assert_allclose(out[0].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[1, :20].mean(axis=0), 0.0, atol=1e-5)


def test_speed_perturb_length():
    wav = np.ones((1600,), np.float32)
    fast = speed_perturb_resample(wav, 1.1)
    slow = speed_perturb_resample(wav, 0.9)
    assert abs(len(fast) - 1600 / 1.1) < 2
    assert abs(len(slow) - 1600 / 0.9) < 2


def test_specaug_masks_and_preserves_shape():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 60, 40)).astype(np.float32) + 5)
    lengths = jnp.asarray(np.array([60, 50, 30], np.int32))
    key = jax.random.PRNGKey(0)
    out = np.asarray(specaug(key, x, lengths, num_freq_masks=2,
                             freq_mask_width=10, num_time_masks=2,
                             time_mask_width=20, apply_warp=True))
    assert out.shape == x.shape
    # some entries zeroed
    assert (out == 0).sum() > 0
    # deterministic given key
    out2 = np.asarray(specaug(key, x, lengths, num_freq_masks=2,
                              freq_mask_width=10, num_time_masks=2,
                              time_mask_width=20, apply_warp=True))
    np.testing.assert_array_equal(out, out2)
