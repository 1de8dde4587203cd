"""SpecAugment as pure jit-able ops (freq/time masking + time warp).

Replaces the reference's on-GPU SpecAug module
(/root/reference/cat/shared/specaug.py:16-349 — MaskFreq, MaskTime with
adaptive widths, time_warp), applied inside the train step
(cat/shared/manager.py:528-531). Here it is a pure function of a PRNG key,
fully traceable, with static mask counts and length-aware masking.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mask_axis(key, feats, lengths, axis_len, num_masks, max_width,
               along_time):
    """Apply `num_masks` random zero-masks along one axis. feats (N,T,F)."""
    N = feats.shape[0]
    keys = jax.random.split(key, 2)
    widths = jax.random.randint(keys[0], (N, num_masks), 0, max_width + 1)
    if along_time:
        limit = lengths
    else:
        limit = jnp.full((N,), axis_len)
    starts = (jax.random.uniform(keys[1], (N, num_masks))
              * jnp.maximum(limit[:, None] - widths, 1)).astype(jnp.int32)
    pos = jnp.arange(axis_len)  # (L,)
    # (N, M, L) True where masked
    masked = ((pos[None, None, :] >= starts[:, :, None])
              & (pos[None, None, :] < (starts + widths)[:, :, None]))
    masked = jnp.any(masked, axis=1)  # (N, L)
    if along_time:
        return jnp.where(masked[:, :, None], 0.0, feats)
    return jnp.where(masked[:, None, :], 0.0, feats)


def time_warp(key, feats, lengths, window: int):
    """Piecewise-linear warp along time around a random center ±window.

    Vectorized gather version of torch sparse_image_warp semantics."""
    N, T, F = feats.shape
    k1, k2 = jax.random.split(key)
    valid = jnp.maximum(lengths, 2 * window + 2)
    center = (window + 1 + jax.random.uniform(k1, (N,))
              * jnp.maximum(valid - 2 * (window + 1), 1)).astype(jnp.int32)
    shift = jax.random.randint(k2, (N,), -window, window + 1)
    new_center = jnp.clip(center + shift, 1, jnp.maximum(valid - 2, 1))
    t = jnp.arange(T)[None, :].astype(jnp.float32)  # (N, T)
    c = center[:, None].astype(jnp.float32)
    nc = new_center[:, None].astype(jnp.float32)
    ln = valid[:, None].astype(jnp.float32)
    # piecewise linear map: [0, nc] -> [0, c], [nc, len) -> [c, len)
    src = jnp.where(
        t <= nc,
        t * c / jnp.maximum(nc, 1.0),
        c + (t - nc) * (ln - 1 - c) / jnp.maximum(ln - 1 - nc, 1.0))
    src = jnp.clip(src, 0.0, T - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    frac = (src - i0)[:, :, None]
    g0 = jnp.take_along_axis(feats, i0[:, :, None], axis=1)
    g1 = jnp.take_along_axis(feats, i1[:, :, None], axis=1)
    warped = g0 * (1 - frac) + g1 * frac
    # don't warp beyond the valid region
    keep = t[:, :, None] < ln[:, :, None]
    return jnp.where(keep, warped, feats)


@partial(jax.jit, static_argnames=("num_freq_masks", "freq_mask_width",
                                   "num_time_masks", "time_mask_width",
                                   "time_mask_ratio", "warp_window",
                                   "apply_warp"))
def specaug(key, feats, lengths, num_freq_masks=2, freq_mask_width=27,
            num_time_masks=2, time_mask_width=100, time_mask_ratio=0.2,
            warp_window=5, apply_warp=False):
    """SpecAugment. feats (N, T, F) + lengths (N,) → masked feats.

    time mask width is adaptively capped at time_mask_ratio * length
    (the reference's adaptive MaskTime, specaug.py)."""
    N, T, F = feats.shape
    k_f, k_t, k_w = jax.random.split(key, 3)
    if apply_warp and warp_window > 0:
        feats = time_warp(k_w, feats, lengths, warp_window)
    if num_freq_masks > 0:
        feats = _mask_axis(k_f, feats, lengths, F, num_freq_masks,
                           min(freq_mask_width, F), along_time=False)
    if num_time_masks > 0:
        # adaptive cap: per-batch min of ratio * length and configured max
        cap = int(time_mask_width)
        feats = _mask_time_adaptive(k_t, feats, lengths, num_time_masks,
                                    cap, time_mask_ratio)
    return feats


def _mask_time_adaptive(key, feats, lengths, num_masks, max_width, ratio):
    N, T, F = feats.shape
    k1, k2 = jax.random.split(key)
    per_seq_cap = jnp.minimum(
        jnp.asarray(max_width),
        (lengths.astype(jnp.float32) * ratio).astype(jnp.int32))
    widths = (jax.random.uniform(k1, (N, num_masks))
              * (per_seq_cap[:, None] + 1)).astype(jnp.int32)
    starts = (jax.random.uniform(k2, (N, num_masks))
              * jnp.maximum(lengths[:, None] - widths, 1)).astype(jnp.int32)
    pos = jnp.arange(T)
    masked = ((pos[None, None, :] >= starts[:, :, None])
              & (pos[None, None, :] < (starts + widths)[:, :, None]))
    masked = jnp.any(masked, axis=1)
    return jnp.where(masked[:, :, None], 0.0, feats)
