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
    """MVDR: w = (Φn⁻¹ Φs / tr(Φn⁻¹ Φs)) · u_ref  → (N, F, C).

    With Φn = the OBSERVED-signal covariance this is the MPDR beamformer
    (dnn_beamformer.py:277-281,330-332 — same get_mvdr_vector, psd_n
    swapped for the observation PSD)."""
    C = phi_n.shape[-1]
    eye = jnp.eye(C, dtype=phi_n.dtype)
    trace_n = jnp.einsum("nfcc->nf", phi_n).real[..., None, None]
    phi_n_r = phi_n + diag_eps * jnp.maximum(trace_n, 1e-6) * eye
    num = jnp.linalg.solve(phi_n_r, phi_s)            # Φn⁻¹ Φs
    tr = jnp.einsum("nfcc->nf", num)
    tr = jnp.where(jnp.abs(tr) < 1e-8, 1e-8 + 0j, tr)
    w = num[..., ref_channel] / tr[..., None]         # (N, F, C)
    return w


def gev_weights(phi_s, phi_n, iterations=6, diag_eps=1e-5):
    """GEV / max-SNR beamformer (dnn_beamformer.py get_gev_vector):
    w = principal generalized eigenvector of (Φs, Φn), computed with
    jit-friendly power iteration on Φn⁻¹Φs (C is tiny), then
    BAN-free phase normalization against channel 0 → (N, F, C)."""
    C = phi_n.shape[-1]
    eye = jnp.eye(C, dtype=phi_n.dtype)
    trace_n = jnp.einsum("nfcc->nf", phi_n).real[..., None, None]
    phi_n_r = phi_n + diag_eps * jnp.maximum(trace_n, 1e-6) * eye
    m = jnp.linalg.solve(phi_n_r, phi_s)              # (N, F, C, C)
    v = jnp.ones(m.shape[:-1], m.dtype)               # (N, F, C)
    for _ in range(iterations):
        v = jnp.einsum("nfcd,nfd->nfc", m, v)
        v = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-10)
    # fix the arbitrary per-bin phase to the reference channel
    phase = v[..., :1] / jnp.maximum(jnp.abs(v[..., :1]), 1e-10)
    return v * jnp.conj(phase)


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
    # "mvdr" | "mpdr" | "gev" | "wpd" (dnn_beamformer.py:218 minus
    # "filter", which is the separate NeuralFilter module below)
    beamformer_type: str = "mvdr"
    use_wpe: bool = False               # WPE dereverb before beamforming
    use_dnn_mask_for_wpe: bool = True   # beamformer_net.py:97-103
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iterations: int = 1
    # Kaldi-feature variant knobs (cat/ctc/train_me2e_kaldi.py:116-151):
    # kaldi_framing applies per-frame DC-offset removal + pre-emphasis
    # before windowing (Feature_Trans / torchaudio kaldi compliance,
    # cat/front/kaldifbank.py:192-225, dither=0), matching
    # ops/fbank.log_fbank exactly; no_enhance is the reference's `noSE`
    # ChannelSelector mode (cat/front/multi2mono.py) — bypass the mask
    # net + beamformer and take the reference channel as-is.
    kaldi_framing: bool = False
    no_enhance: bool = False

    def __call__(self, wave, wave_lengths, deterministic=True):
        spec, frame_lengths = self.spectrum(wave, wave_lengths)
        return self.enhance(spec, frame_lengths, deterministic)

    def spectrum(self, wave, wave_lengths):
        """(N, C, L) wave → ((N, C, T, F) complex STFT, frame lengths).

        Inline (module-free) STFT: this method is called from other
        modules (ctc/train_me2e_chunk.py), where constructing a
        submodule outside setup/compact is not allowed."""
        L = wave.shape[-1]
        T = 1 + (L - self.frame_length) // self.frame_shift
        idx = (jnp.arange(T)[:, None] * self.frame_shift
               + jnp.arange(self.frame_length)[None, :])
        frames = wave[..., idx]
        if self.kaldi_framing:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
            pre = jnp.concatenate(
                [frames[..., :1], frames[..., :-1]], axis=-1)
            frames = frames - 0.97 * pre
        win = jnp.asarray(povey_window(self.frame_length))
        spec = jnp.fft.rfft(frames * win, n=self.fft_size, axis=-1)
        flens = 1 + (wave_lengths - self.frame_length) \
            // self.frame_shift
        return spec, flens.astype(jnp.int32)

    @nn.compact
    def enhance(self, spec, frame_lengths, deterministic=True):
        """STFT-domain enhancement: (N, C, T, F) → log-mel (N, T, B).

        Separated from __call__ so the chunked ME2E trainer
        (ctc/train_me2e_chunk.py) can beamform context windows
        directly in the STFT domain (train_me2e_chunk.py:64-160)."""
        if self.no_enhance:
            # noSE / ChannelSelector: no mask net, no beamformer params
            bf = spec[:, self.ref_channel]             # (N, T, F)
            power = jnp.abs(bf) ** 2
            feats = LogMel(self.num_bins, self.fft_size,
                           self.sample_rate)(power)
            return feats, frame_lengths
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
        if self.beamformer_type == "wpd":
            bf = wpd_beamform(spec, m_s, frame_lengths,
                              taps=self.wpe_taps, delay=self.wpe_delay,
                              ref_channel=self.ref_channel)  # (N, T, F)
        else:
            phi_s = _spatial_cov(spec, m_s, frame_lengths)
            if self.beamformer_type == "mpdr":
                # distortionless against the OBSERVED covariance
                phi_n = _spatial_cov(
                    spec, jnp.ones_like(m_s), frame_lengths)
            else:
                phi_n = _spatial_cov(spec, m_n, frame_lengths)
            if self.beamformer_type == "gev":
                w = gev_weights(phi_s, phi_n)          # (N, F, C)
            else:
                w = mvdr_weights(phi_s, phi_n, self.ref_channel)
            x = jnp.transpose(spec, (0, 3, 2, 1))      # (N, F, T, C)
            bf = jnp.einsum("nftc,nfc->nft", x, jnp.conj(w))
            bf = jnp.transpose(bf, (0, 2, 1))          # (N, T, F)
        power = jnp.abs(bf) ** 2
        feats = LogMel(self.num_bins, self.fft_size,
                       self.sample_rate)(power)
        return feats, frame_lengths


def wpd_beamform(spec, mask_s, lengths, taps=5, delay=3, ref_channel=0,
                 diag_eps=1e-7, eps=1e-6):
    """WPD convolutional beamformer (Nakatani & Kinoshita 2019) —
    counterpart of /root/reference/cat/front/conv_beamformer.py
    (get_WPD_filter_v2 + perform_WPD_filtering): joint denoising +
    dereverberation with one distortionless filter over the tap-stacked
    signal.

      Ỹ_t = [X_t, X_{t−Δ}, …, X_{t−Δ−K+1}]        ((K+1)·C per frame)
      R   = Σ_t Ỹ_t Ỹ_tᴴ / φ_t                    (φ = speech power)
      h   = R⁻¹[:, :C] Φ_s u_ref / tr(R⁻¹[:C,:C] Φ_s)
      out = hᴴ Ỹ                                   (N, T, F)

    spec: (N, C, T, F) complex; mask_s: (N, T, F) speech mask.
    """
    from cat_tpu.front.wpe import _tap_stack

    N, C, T, F = spec.shape
    x = jnp.transpose(spec, (0, 3, 1, 2))              # (N, F, C, T)
    tmask = (jnp.arange(T)[None, :] < lengths[:, None])  # (N, T)
    m = jnp.where(tmask[..., None], mask_s, 0.0)       # (N, T, F)

    # speech PSD (C, C) per (n, f)
    mw = jnp.transpose(m, (0, 2, 1))                   # (N, F, T)
    xm = x * mw[:, :, None, :].astype(x.dtype)
    phi = jnp.einsum("nfct,nfdt->nfcd", xm, jnp.conj(x))
    den = jnp.maximum(jnp.sum(mw, axis=-1), eps)
    phi = phi / den[..., None, None].astype(phi.dtype)

    # power-normalized spatio-temporal covariance over Ỹ
    power = jnp.einsum("nfct,nfct->nft", xm, jnp.conj(x)).real / C
    u = jnp.where(tmask[:, None, :], 1.0 / jnp.maximum(power, eps), 0.0)
    ytil = jnp.concatenate([x, _tap_stack(x, taps, delay)], axis=-2)
    yw = ytil * u[:, :, None, :].astype(ytil.dtype)
    R = jnp.einsum("nfkt,nflt->nfkl", yw, jnp.conj(ytil))
    KC = (taps + 1) * C
    eye = jnp.eye(KC, dtype=R.dtype)
    trace = jnp.einsum("nfkk->nf", R).real[..., None, None]
    R = R + diag_eps * jnp.maximum(trace, eps) * eye
    # R⁻¹ restricted to the current-frame block (first C columns)
    cols = jnp.broadcast_to(eye[:, :C], R.shape[:-2] + (KC, C))
    inv_cols = jnp.linalg.solve(R, cols)               # (N, F, KC, C)
    num = jnp.einsum("nfkc,nfcd->nfkd", inv_cols, phi)  # (N, F, KC, C)
    tr = jnp.einsum("nfcc->nf", num[..., :C, :])
    tr = jnp.where(jnp.abs(tr) < eps, eps + 0j, tr)
    w = num[..., ref_channel] / tr[..., None]          # (N, F, KC)
    bf = jnp.einsum("nfk,nfkt->nft", jnp.conj(w), ytil)
    return jnp.transpose(bf, (0, 2, 1))                # (N, T, F)


class ChannelSelector(nn.Module):
    """Pick one channel of a multichannel wave/spec
    (front/multi2mono.py ChannelSelector)."""

    chosen_channel: int = 0

    def __call__(self, x, lengths):
        # x: (N, C, ...) → (N, ...)
        return x[:, self.chosen_channel], lengths


class NeuralFilter(nn.Module):
    """Neural complex filter-and-sum (front/filter_net.py FilterNet):
    a BLSTM on the stacked log-power of all channels predicts per-
    channel complex filter weights per T-F bin; output = Σ_c w*_c X_c.
    Differentiable alternative to mask+MVDR for small arrays."""

    hidden: int = 256

    @nn.compact
    def __call__(self, spec, lengths, deterministic=True):
        from cat_tpu.models.encoders import LSTMStack

        N, C, T, F = spec.shape
        logp = jnp.log(jnp.maximum(jnp.abs(spec) ** 2, 1e-10))
        feat = jnp.transpose(logp, (0, 2, 1, 3)).reshape(N, T, C * F)
        h = LSTMStack(self.hidden, 2, True, 0.0)(feat, lengths,
                                                 deterministic)
        wr = nn.Dense(C * F, name="filt_re")(h).reshape(N, T, C, F)
        wi = nn.Dense(C * F, name="filt_im")(h).reshape(N, T, C, F)
        w = (wr + 1j * wi).astype(spec.dtype)
        x = jnp.transpose(spec, (0, 2, 1, 3))        # (N, T, C, F)
        out = jnp.sum(jnp.conj(w) * x, axis=2)       # (N, T, F)
        return out
