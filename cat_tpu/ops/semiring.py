"""Log-semiring helpers shared by the CTC / CRF / RNN-T losses.

We work with finite "minus infinity" (LOG_EPS) instead of -inf so that
(-inf) - (-inf) style NaNs can never appear inside scans, matching the
guarded log-math of the reference CUDA kernels
(/root/reference/src/ctc_crf/gpu_den/den_calculate.cu:19-49 log_plus) while
staying branch-free for the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Finite stand-in for log(0). Large enough that exp() underflows to exactly
# 0.0 in f32, small enough that sums of a few of them do not overflow.
LOG_EPS = -1e30


def safe_logaddexp(a, b):
    """logaddexp that treats values <= LOG_EPS/2 as exact zeros (no NaNs)."""
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    # exp(mn - mx) underflows to 0 when mn is LOG_EPS → returns mx exactly.
    out = mx + jnp.log1p(jnp.exp(mn - mx))
    # If both are "zero", keep LOG_EPS rather than LOG_EPS + log(2).
    return jnp.where(mx <= LOG_EPS / 2, LOG_EPS, out)


def logaddexp3(a, b, c):
    """Three-way logaddexp via a single max, cheaper than chaining."""
    mx = jnp.maximum(jnp.maximum(a, b), c)
    out = mx + jnp.log(
        jnp.exp(a - mx) + jnp.exp(b - mx) + jnp.exp(c - mx)
    )
    return jnp.where(mx <= LOG_EPS / 2, LOG_EPS, out)


def masked_logsumexp(x, mask, axis=-1, keepdims=False):
    """logsumexp over `axis` counting only entries where mask is True."""
    neg = jnp.where(mask, x, LOG_EPS)
    mx = jnp.max(neg, axis=axis, keepdims=True)
    mx_safe = jnp.maximum(mx, LOG_EPS)  # avoid -inf
    s = jnp.sum(jnp.where(mask, jnp.exp(neg - mx_safe), 0.0), axis=axis,
                keepdims=True)
    out = mx_safe + jnp.log(jnp.maximum(s, 1e-37))
    out = jnp.where(mx <= LOG_EPS / 2, LOG_EPS, out)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def segment_logsumexp(data, segment_ids, num_segments):
    """Log-domain segmented reduction: out[k] = logsumexp(data[segment_ids==k]).

    Deterministic replacement for the reference's atomic-CAS log_plus
    accumulation (den_calculate.cu:37-49): two-pass max + sum-of-exp using
    XLA segment reductions, batched over leading axes of `data` if
    segment_ids is 1-D over the last axis.
    """
    mx = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    mx = jnp.maximum(mx, LOG_EPS)
    gathered_mx = mx[segment_ids]
    s = jax.ops.segment_sum(jnp.exp(data - gathered_mx), segment_ids,
                            num_segments=num_segments)
    out = mx + jnp.log(jnp.maximum(s, 1e-37))
    return jnp.where(s <= 0.0, LOG_EPS, out)
