"""Neural mask-based MVDR beamforming frontend (flax/jnp, complex64).

Counterpart of /root/reference/cat/front/beamformer_net.py:25+ (ESPnet-
derived MVDR/WPD masks), cat/front/stft.py and log_mel.py, used by the
ME2E trainers (cat/ctc/train_me2e.py:105-247 — STFT → beamform → fbank →
encoder → CTC/CRF).

Pipeline: multichannel wave (N, C, L) → STFT (N, C, T, F) complex →
BLSTM mask net on the reference channel → speech/noise masks (N, T, F) →
spatial covariances → MVDR weights (N, F, C) → beamformed STFT (N, T, F)
→ log-mel (N, T, B). All ops are jnp and differentiable end-to-end.
"""
from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from cat_tpu.ops.fbank import mel_filterbank, povey_window


class Stft(nn.Module):
    """Batched STFT: (..., L) → (..., T, F) complex64."""

    frame_length: int = 400
    frame_shift: int = 160
    fft_size: int = 512

    def __call__(self, wave):
        L = wave.shape[-1]
        T = 1 + (L - self.frame_length) // self.frame_shift
        idx = (jnp.arange(T)[:, None] * self.frame_shift
               + jnp.arange(self.frame_length)[None, :])
        frames = wave[..., idx]  # (..., T, W)
        win = jnp.asarray(povey_window(self.frame_length))
        return jnp.fft.rfft(frames * win, n=self.fft_size, axis=-1)

    def num_frames(self, num_samples):
        return 1 + (num_samples - self.frame_length) // self.frame_shift


class LogMel(nn.Module):
    """Power spectrum → log-mel (log_mel.py equivalent)."""

    num_bins: int = 80
    fft_size: int = 512
    sample_rate: int = 16000

    def __call__(self, power):
        fb = jnp.asarray(mel_filterbank(self.num_bins, self.fft_size,
                                        self.sample_rate))
        mel = jnp.einsum("...tf,fb->...tb", power, fb,
                         preferred_element_type=jnp.float32)
        return jnp.log(jnp.maximum(mel, 1e-10))


class MaskNet(nn.Module):
    """BLSTM T-F mask estimator on log power of the reference channel."""

    hidden: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, log_power, lengths, deterministic=True):
        # log_power: (N, T, F)
        from cat_tpu.models.encoders import LSTMStack

        h = LSTMStack(self.hidden, self.num_layers, True, 0.0)(
            log_power, lengths, deterministic)
        F = log_power.shape[-1]
        speech = nn.sigmoid(nn.Dense(F, name="speech")(h))
        noise = nn.sigmoid(nn.Dense(F, name="noise")(h))
        return speech, noise


def _spatial_cov(stft_c, mask, lengths):
    """Masked spatial covariance: (N, F, C, C) complex.

    stft_c: (N, C, T, F); mask: (N, T, F) real in [0, 1]."""
    N, C, T, F = stft_c.shape
    tmask = (jnp.arange(T)[None, :, None] < lengths[:, None, None])
    m = jnp.where(tmask, mask, 0.0)                   # (N, T, F)
    x = jnp.transpose(stft_c, (0, 3, 2, 1))           # (N, F, T, C)
    mw = jnp.transpose(m, (0, 2, 1))[..., None]       # (N, F, T, 1)
    num = jnp.einsum("nftc,nftd->nfcd", x * mw, jnp.conj(x))
    den = jnp.maximum(jnp.sum(mw[..., 0], axis=-1), 1e-6)  # (N, F)
    return num / den[..., None, None]


def mvdr_weights(phi_s, phi_n, ref_channel=0, diag_eps=1e-5):
    """MVDR: w = (Φn⁻¹ Φs / tr(Φn⁻¹ Φs)) · u_ref  → (N, F, C)."""
    C = phi_n.shape[-1]
    eye = jnp.eye(C, dtype=phi_n.dtype)
    trace_n = jnp.einsum("nfcc->nf", phi_n).real[..., None, None]
    phi_n_r = phi_n + diag_eps * jnp.maximum(trace_n, 1e-6) * eye
    num = jnp.linalg.solve(phi_n_r, phi_s)            # Φn⁻¹ Φs
    tr = jnp.einsum("nfcc->nf", num)
    tr = jnp.where(jnp.abs(tr) < 1e-8, 1e-8 + 0j, tr)
    w = num[..., ref_channel] / tr[..., None]         # (N, F, C)
    return w


class BeamformerNet(nn.Module):
    """STFT-domain neural MVDR frontend (beamformer_net.py:25+).

    (N, C, L) wave → (N, T, num_bins) log-mel features + frame lengths.
    """

    num_bins: int = 80
    sample_rate: int = 16000
    frame_length: int = 400
    frame_shift: int = 160
    fft_size: int = 512
    mask_hidden: int = 256
    ref_channel: int = 0
    use_wpe: bool = False               # WPE dereverb before beamforming
    use_dnn_mask_for_wpe: bool = True   # beamformer_net.py:97-103
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iterations: int = 1

    @nn.compact
    def __call__(self, wave, wave_lengths, deterministic=True):
        stft = Stft(self.frame_length, self.frame_shift, self.fft_size)
        spec = stft(wave)                              # (N, C, T, F)
        frame_lengths = stft.num_frames(wave_lengths).astype(jnp.int32)
        if self.use_wpe:
            from cat_tpu.front.wpe import DnnWpe, wpe

            if self.use_dnn_mask_for_wpe:
                spec, _ = DnnWpe(self.wpe_taps, self.wpe_delay,
                                 self.wpe_iterations, self.mask_hidden)(
                    spec, frame_lengths, deterministic)
            else:
                spec = wpe(spec, frame_lengths, self.wpe_taps,
                           self.wpe_delay, max(self.wpe_iterations, 3))
        ref_pow = jnp.abs(spec[:, self.ref_channel]) ** 2  # (N, T, F)
        log_pow = jnp.log(jnp.maximum(ref_pow, 1e-10))
        m_s, m_n = MaskNet(self.mask_hidden)(log_pow, frame_lengths,
                                             deterministic)
        phi_s = _spatial_cov(spec, m_s, frame_lengths)
        phi_n = _spatial_cov(spec, m_n, frame_lengths)
        w = mvdr_weights(phi_s, phi_n, self.ref_channel)  # (N, F, C)
        x = jnp.transpose(spec, (0, 3, 2, 1))          # (N, F, T, C)
        bf = jnp.einsum("nftc,nfc->nft", x, jnp.conj(w))
        bf = jnp.transpose(bf, (0, 2, 1))              # (N, T, F)
        power = jnp.abs(bf) ** 2
        feats = LogMel(self.num_bins, self.fft_size,
                       self.sample_rate)(power)
        return feats, frame_lengths
