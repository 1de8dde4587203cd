"""WPE dereverberation (Weighted Prediction Error) in pure jnp.

Counterpart of /root/reference/cat/front/dnn_wpe_new.py (DNN_WPE, which
wraps pytorch_wpe.wpe_one_iteration) used by the ME2E frontend
(/root/reference/cat/front/beamformer_net.py:96-118,178-219).

Algorithm (per frequency bin, standard nara-WPE):
  1. power estimate = mean_c |X|^2, optionally weighted by a DNN mask;
     inverse power u_t = 1 / max(power_t, eps).
  2. delayed tap stack  Ỹ_t = [X_{t-Δ}, …, X_{t-Δ-K+1}] over all C
     channels → (K·C) vector per frame (Δ = delay, K = taps).
  3. R = Σ_t u_t Ỹ_t Ỹ_tᴴ   (KC×KC),   P = Σ_t u_t Ỹ_t X_tᴴ  (KC×C)
  4. G = R⁻¹ P;  dereverberated  X̂_t = X_t − Gᴴ Ỹ_t.

Everything is batched over (N, F) with einsums — the (KC×KC) solves are
small and map onto batched MXU matmuls; no per-frequency Python loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _tap_stack(x, taps: int, delay: int):
    """x: (..., C, T) complex → (..., K*C, T) delayed tap stack.

    Row k*C + c holds x[c] shifted right by (delay + k) frames,
    zero-padded at the start (frames before the signal are silence).
    """
    parts = []
    for k in range(taps):
        shift = delay + k
        shifted = jnp.pad(x[..., :-shift] if shift > 0 else x,
                          [(0, 0)] * (x.ndim - 1) + [(shift, 0)])
        parts.append(shifted)
    return jnp.concatenate(parts, axis=-2)  # (..., K*C, T)


def wpe_one_iteration(spec, power, lengths, taps: int = 5, delay: int = 3,
                      eps: float = 1e-6, diag_eps: float = 1e-7):
    """One WPE filter estimation + application.

    spec:    (N, C, T, F) complex64 STFT.
    power:   (N, T, F) real power estimate (mask-weighted or plain).
    lengths: (N,) valid frame counts.
    Returns dereverberated STFT, same shape as ``spec``.
    """
    N, C, T, F = spec.shape
    x = jnp.transpose(spec, (0, 3, 1, 2))                  # (N, F, C, T)
    tmask = (jnp.arange(T)[None, :] < lengths[:, None])    # (N, T)
    u = 1.0 / jnp.maximum(power, eps)                      # (N, T, F)
    u = jnp.where(tmask[..., None], u, 0.0)
    u = jnp.transpose(u, (0, 2, 1))                        # (N, F, T)

    ytil = _tap_stack(x, taps, delay)                      # (N, F, KC, T)
    yw = ytil * u[:, :, None, :].astype(ytil.dtype)        # weighted
    # R: (N, F, KC, KC); P: (N, F, KC, C)
    R = jnp.einsum("nfkt,nflt->nfkl", yw, jnp.conj(ytil))
    P = jnp.einsum("nfkt,nfct->nfkc", yw, jnp.conj(x))
    KC = taps * C
    eye = jnp.eye(KC, dtype=R.dtype)
    trace = jnp.einsum("nfkk->nf", R).real[..., None, None]
    G = jnp.linalg.solve(R + diag_eps * jnp.maximum(trace, eps) * eye, P)
    # X̂ = X − Gᴴ Ỹ
    pred = jnp.einsum("nfkc,nfkt->nfct", jnp.conj(G), ytil)
    xhat = x - pred
    return jnp.transpose(xhat, (0, 2, 3, 1))               # (N, C, T, F)


def wpe(spec, lengths, taps: int = 5, delay: int = 3, iterations: int = 3,
        eps: float = 1e-6):
    """Iterative (blind) WPE: re-estimate power from the current estimate.

    Matches DNN_WPE with use_dnn_mask=False (conventional WPE,
    dnn_wpe_new.py:100-103).
    """
    out = spec
    for _ in range(iterations):
        power = jnp.mean(jnp.abs(out) ** 2, axis=1)        # (N, T, F)
        out = wpe_one_iteration(spec, power, lengths, taps, delay, eps)
    return out


class DnnWpe(nn.Module):
    """DNN-mask WPE (dnn_wpe_new.py DNN_WPE, use_dnn_mask=True).

    A BLSTM mask net scales the power estimate; one (or more) WPE
    iterations follow. Differentiable end-to-end.
    """

    taps: int = 5
    delay: int = 3
    iterations: int = 1
    mask_hidden: int = 256
    normalization: bool = False
    mask_flooring: bool = False
    flooring_thres: float = 1e-6
    eps: float = 1e-6

    @nn.compact
    def __call__(self, spec, lengths, deterministic=True):
        """spec: (N, C, T, F) complex → (dereverbed spec, mask)."""
        from cat_tpu.front.beamformer import MaskNet

        power = jnp.mean(jnp.abs(spec) ** 2, axis=1)       # (N, T, F)
        log_pow = jnp.log(jnp.maximum(power, 1e-10))
        mask, _ = MaskNet(self.mask_hidden, num_layers=2)(
            log_pow, lengths, deterministic)
        if self.mask_flooring:
            mask = jnp.maximum(mask, self.flooring_thres)
        if self.normalization:
            mask = mask / jnp.maximum(
                jnp.sum(mask, axis=1, keepdims=True), self.eps)
        out = spec
        for _ in range(self.iterations):
            out = wpe_one_iteration(spec, power * mask, lengths,
                                    self.taps, self.delay, self.eps)
            power = jnp.mean(jnp.abs(out) ** 2, axis=1)
        return out, mask
