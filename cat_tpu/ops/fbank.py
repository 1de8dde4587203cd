"""Batched on-device log-mel filterbank frontend.

Replaces the reference's torchaudio/Kaldi feature prep
(/root/reference/cat/utils/data/data_prep.py:33-370 — torchaudio
kaldi-compliance fbank + CMVN + speed perturb) and the torch fbank used by
the multichannel frontend (cat/front/kaldifbank.py).

TPU-first: everything is jnp and jit-able, so feature extraction can run
fused with the train step on device (batch, static shapes), instead of a
CPU preprocessing pass. Kaldi conventions: 25 ms povey window, 10 ms
shift, pre-emphasis 0.97, HTK mel scale (1127·ln(1+f/700)), snip-edges.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def mel_filterbank(num_bins: int, fft_size: int, sample_rate: int,
                   low_freq: float = 20.0, high_freq: float | None = None):
    """(num_fft_bins, num_mel_bins) triangular filterbank matrix, numpy."""
    if high_freq is None:
        high_freq = sample_rate / 2.0

    def mel(f):
        return 1127.0 * np.log1p(f / 700.0)

    def imel(m):
        return 700.0 * (np.expm1(m / 1127.0))

    n_freqs = fft_size // 2 + 1
    freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(mel(low_freq), mel(high_freq), num_bins + 2)
    f_pts = imel(mel_pts)
    fb = np.zeros((n_freqs, num_bins), np.float32)
    for b in range(num_bins):
        l, c, r = f_pts[b], f_pts[b + 1], f_pts[b + 2]
        up = (freqs - l) / max(c - l, 1e-9)
        down = (r - freqs) / max(r - c, 1e-9)
        fb[:, b] = np.maximum(0.0, np.minimum(up, down))
    return fb


def povey_window(n: int):
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    return (hann ** 0.85).astype(np.float32)


def num_frames(num_samples, frame_length=400, frame_shift=160):
    """Kaldi snip-edges frame count (works on ints or arrays)."""
    return jnp.maximum(
        0, 1 + (num_samples - frame_length) // frame_shift)


@partial(jax.jit, static_argnames=("num_bins", "sample_rate",
                                   "frame_length", "frame_shift",
                                   "fft_size", "preemph"))
def log_fbank(waveform, num_bins=80, sample_rate=16000, frame_length=400,
              frame_shift=160, fft_size=512, preemph=0.97):
    """(N, num_samples) f32 waveform → (N, T, num_bins) log-mel features.

    T = 1 + (num_samples - frame_length) // frame_shift (snip-edges).
    Callers track true frame counts via `num_frames` for padded batches.
    """
    N, L = waveform.shape
    T = 1 + (L - frame_length) // frame_shift
    # frame extraction: gather strided windows
    idx = (jnp.arange(T)[:, None] * frame_shift
           + jnp.arange(frame_length)[None, :])  # (T, W)
    frames = waveform[:, idx]  # (N, T, W)
    # per-frame DC offset removal (Kaldi remove_dc_offset=True)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # pre-emphasis within frame (Kaldi convention)
    pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemph * pre
    window = jnp.asarray(povey_window(frame_length))
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    power = jnp.abs(spec) ** 2  # (N, T, fft/2+1)
    fb = jnp.asarray(mel_filterbank(num_bins, fft_size, sample_rate))
    mel = jnp.einsum("ntf,fb->ntb", power, fb,
                     preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, 1e-10))


def cmvn(feats, lengths=None, norm_var=False):
    """Per-utterance cepstral mean (and optional variance) normalization.

    feats: (N, T, F); lengths: (N,) valid frame counts (None = all)."""
    if lengths is None:
        mean = jnp.mean(feats, axis=1, keepdims=True)
        var = jnp.var(feats, axis=1, keepdims=True)
    else:
        mask = (jnp.arange(feats.shape[1])[None, :, None]
                < lengths[:, None, None])
        cnt = jnp.maximum(lengths[:, None, None].astype(feats.dtype), 1.0)
        mean = jnp.sum(jnp.where(mask, feats, 0.0), axis=1,
                       keepdims=True) / cnt
        var = jnp.sum(jnp.where(mask, (feats - mean) ** 2, 0.0), axis=1,
                      keepdims=True) / cnt
    out = feats - mean
    if norm_var:
        out = out / jnp.sqrt(var + 1e-8)
    return out


def speed_perturb_resample(waveform, factor: float):
    """Linear-interp resampling for speed perturbation at prep time
    (factors 0.9/1.0/1.1 in the reference recipes). Host-side numpy."""
    wav = np.asarray(waveform)
    n_out = int(round(wav.shape[-1] / factor))
    src = np.arange(n_out) * factor
    i0 = np.clip(src.astype(np.int64), 0, wav.shape[-1] - 1)
    i1 = np.clip(i0 + 1, 0, wav.shape[-1] - 1)
    frac = (src - i0).astype(wav.dtype)
    return wav[..., i0] * (1 - frac) + wav[..., i1] * frac
