"""Pallas TPU kernel for the dense CTC-CRF denominator forward pass.

The XLA scan in ops/crf_dense.py streams the two (N, V, V) alpha
tensors (plus ~a dozen intermediates) through HBM every frame — at the
flagship shape that is ~60 us/frame (~24 ms/step) for ~3 us of MXU
work. This kernel holds the whole recursion in VMEM: the alphas live
in a scratch buffer across a sequential grid over ckpt-segments, each
frame is one leading-batch MXU contraction plus VPU elementwise work,
and only the per-segment snapshot checkpoints (what the unchanged XLA
backward consumes) and the final log-partition ever leave the chip.

Two representation changes versus the XLA path, both invisible outside:

* exp-domain with per-frame rescaling (the classic scaled HMM forward):
  alphas are probabilities normalized to max 1 with a per-sequence log
  scale carried separately — no exp/log transcendentals in the loop.
  The log-domain max-shift contraction of crf_dense._emit_contract is
  exactly this with the shift recomputed every step.
* ctx2-major ("B") layout alpha2[b, n, a] = alpha[n, a, b], so the
  emission contraction T[n,b,u] = sum_a alpha[n,a,b] * W[a,b,u] is a
  leading-batch dot_general (batch dims at the SAME operand positions —
  the formulation Mosaic accepts; the (a,b)-batched einsum the XLA path
  uses is the one it rejects). The price is one (V, 2N, V) (2,1,0)
  transpose per frame (~3 us, measured), since the emit output lands
  ctx1-major.

Counterpart of the reference's gpu_den forward kernels
(/root/reference/src/ctc_crf/gpu_den/den_calculate.cu:427-481 —
per-frame kernel launches over sparse arc lists); here the whole
T-frame recursion is ONE kernel launch of dense MXU work.

The backward stays in XLA (crf_dense._den_bwd): this kernel emits
log-domain segment snapshots identical in semantics to the XLA
forward's, so gradients are bit-compatible with the golden-tested path
regardless of kernel internals.

MEASURED REJECTION (round 5, live v5e, flagship shape N=128 T=400 V=72
K=24): isolated den fwd — XLA scan 8.22 ms, this kernel 10.90 ms
(27.3 us/frame; the f32 emission contraction pays ~3.2x MXU padding
waste at V=72-on-128 lanes plus the f32 multi-pass rate); full-step
bench 3126 vs 3159 audio-s/s baseline under identical load. The flag
stays OFF. Two conclusions worth keeping: (1) the step-trace's
"den fwd 24 ms" was scheduling stalls around the while-loop, not
compute — the XLA scan in isolation is already within ~2.6x of this
kernel's own VMEM-resident floor, so the den lever is far smaller than
the round-4 ranking claimed; (2) Mosaic DOES accept leading-batch
dot_general (the formulation here), so the "batch dims must be equal"
blocker recorded in round 5's first half is closed. A bf16 emission
contraction (CAT_TPU_DEN_BF16=1) measured NEUTRAL (27.0 vs 27.3
us/frame) — the matmul is not the kernel's bottleneck; the per-frame
(V, 2N, V) transpose and the elementwise chain are. Any future attempt
must eliminate the transpose (e.g. a layout where emit output lands
state-major) before anything else.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cat_tpu.ops.semiring import LOG_EPS

_VMEM_LIMIT = 100 * 2 ** 20

# bf16 emission contraction (f32 accumulate): alphas are rescaled to
# max 1 every frame, so bf16's ~0.4% relative error random-walks to
# ~0.1 nat on the 400-frame log-partition — fine for training, outside
# golden tolerance. Env-only experiment knob, off by default.
import os as _os
_BF16 = _os.environ.get("CAT_TPU_DEN_BF16", "") == "1"


def _den_fwd_kernel(len_ref, expy_ref, w_ref, eye_ref, ft_ref,
                    snap_ref, logz_ref, a2, sc, *, N, V, K, S):
    """Grid step s: snapshot alphas entering segment s, then run its K
    frames in VMEM.

    a2 scratch (V, 2N, V) f32, ctx2-major: a2[:, :N] = alpha_blank,
    a2[:, N:] = alpha_inphone, both scaled so max over states is ~1.
    sc scratch (1, N) f32: the per-sequence log scale."""
    s_idx = pl.program_id(0)

    @pl.when(s_idx == 0)
    def _init():
        # alpha_blank[n, 0, 0] = 1 (BOS context), everything else 0
        bi = jax.lax.broadcasted_iota(jnp.int32, (V, 2 * N, V), 0)
        ni = jax.lax.broadcasted_iota(jnp.int32, (V, 2 * N, V), 1)
        ai = jax.lax.broadcasted_iota(jnp.int32, (V, 2 * N, V), 2)
        a2[...] = jnp.where((bi == 0) & (ni < N) & (ai == 0), 1.0, 0.0)
        sc[...] = jnp.zeros((1, N), jnp.float32)

    # segment-start checkpoint, log domain (matches crf_dense._forward)
    s2 = jnp.concatenate([sc[...], sc[...]], axis=1)[:, :, None]
    cur = a2[...]
    snap_ref[...] = jnp.where(
        cur > 0.0, jnp.log(jnp.maximum(cur, 1e-38)) + s2,
        LOG_EPS)[None]

    w = w_ref[...]            # (V_b, V_a, V_u) = expw transposed
    eye = eye_ref[...]        # (V_u, V_b) f32: 1 where u == b

    def frame(k, _):
        t = s_idx * K + k
        ey = expy_ref[k]                       # (V, N) exp(y_t).T
        active = (len_ref[...] > t).astype(jnp.float32)  # (1, N)
        av = active[:, :, None]                # (1, N, 1)
        cur = a2[...]
        # T[n, b, u] for both sources in one leading-batch contraction
        if _BF16:
            both = jax.lax.dot_general(
                cur.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            both = jax.lax.dot_general(
                cur, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (V_b, 2N, V_u)
        bt = jnp.transpose(both, (2, 1, 0))       # (V_u, 2N, V_b)
        t1 = bt[:, :N]                            # from alpha_blank
        t2 = jnp.where(eye[:, None, :] > 0.0, 0.0, bt[:, N:])  # u != b
        eyn = ey[:, :, None]                      # (V, N, 1)
        emit = (t1 + t2) * eyn
        a_bl = cur[:, :N]
        a_in = cur[:, N:]
        new_in = a_in * eyn + emit
        new_bl = (a_in + a_bl) * ey[0][None, :, None]
        new_in = jnp.where(av > 0.0, new_in, a_in)
        new_bl = jnp.where(av > 0.0, new_bl, a_bl)
        # per-frame rescale to max 1 (inactive rows keep scale 1)
        m = jnp.maximum(jnp.max(new_in, axis=(0, 2)),
                        jnp.max(new_bl, axis=(0, 2)))     # (N,)
        m = jnp.where(active[0] > 0.0, jnp.maximum(m, 1e-37), 1.0)
        inv = (1.0 / m)[None, :, None]
        a2[:, :N] = new_bl * inv
        a2[:, N:] = new_in * inv
        sc[...] += jnp.log(m)[None]
        return 0

    jax.lax.fori_loop(0, K, frame, 0)

    @pl.when(s_idx == S - 1)
    def _finish():
        ft = ft_ref[...][:, None, :]              # (V_b, 1, V_a)
        cur = a2[...]
        tot = jnp.sum((cur[:, :N] + cur[:, N:]) * ft, axis=(0, 2))
        logz_ref[...] = jnp.where(
            tot > 0.0,
            jnp.log(jnp.maximum(tot, 1e-38)) + sc[...][0], LOG_EPS
        )[None]


def dense_den_forward_pallas(log_probs, input_lengths, den,
                             interpret=False):
    """Fused dense-den forward: returns ((a_in_snaps, a_bl_snaps),
    logz) with the exact semantics of crf_dense._forward's snapshots
    (log-domain segment-start alphas) and log-partition."""
    from cat_tpu.ops.crf_dense import _pad_frames

    N, T, V = log_probs.shape
    K = den.ckpt_every
    y, Tp = _pad_frames(log_probs, K)             # (Tp, N, V) log
    S = Tp // K
    expw, final = den.device_tables()
    # exp(LOG_EPS) == 0 exactly; padded frames are inactive anyway
    expy_t = jnp.exp(jnp.maximum(jnp.transpose(y, (0, 2, 1)), LOG_EPS))
    wp = jnp.transpose(expw, (1, 0, 2)).astype(jnp.float32)  # (b,a,u)
    ft = jnp.exp(jnp.maximum(jnp.transpose(final), LOG_EPS)
                 ).astype(jnp.float32)            # (b, a)
    eye = jnp.eye(V, dtype=jnp.float32)
    lens = jnp.asarray(input_lengths, jnp.int32)[None]  # (1, N)

    kernel = functools.partial(_den_fwd_kernel, N=N, V=V, K=K, S=S)
    snaps, logz = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, N), lambda s: (0, 0)),
            pl.BlockSpec((K, V, N), lambda s: (s, 0, 0)),
            pl.BlockSpec((V, V, V), lambda s: (0, 0, 0)),
            pl.BlockSpec((V, V), lambda s: (0, 0)),
            pl.BlockSpec((V, V), lambda s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, V, 2 * N, V), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, N), lambda s: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, V, 2 * N, V), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((V, 2 * N, V), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(lens, expy_t, wp, eye, ft)

    # back to the XLA path's standard layout: (S, N, V_a, V_b)
    a_bl = jnp.transpose(snaps[:, :, :N, :], (0, 2, 3, 1))
    a_in = jnp.transpose(snaps[:, :, N:, :], (0, 2, 3, 1))
    return (a_in, a_bl), logz[0]
