"""Fused TPU dropout (Pallas): mask generated on-chip, never stored.

flax's nn.Dropout costs ~27% of the flagship encoder step (STATUS.md
profile): the bernoulli mask is a separate threefry product that breaks
XLA fusions and round-trips the big (N, T, 4D) FF hiddens and the
(N, H, T, T) attention probs through HBM an extra time. This kernel
fuses generate+compare+scale into ONE pass over the tensor using the
TPU core's hardware PRNG (pltpu.prng_random_bits):

  out = x * (bits >= rate·2³²) / (1 - rate)

and the custom VJP applies the SAME mask to the cotangent by re-seeding
the PRNG with the same seed — no mask residual at all, so it composes
with remat for free (recompute regenerates identical bits).

Role reference: torch.nn.Dropout sites in /root/reference/cat/shared/
layer.py (:424-573 conformer modules). Opt-in via
CAT_TPU_FUSED_DROPOUT=1 (bench default on TPU); nn.Dropout elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ELEMS = 512 * 1024  # elems per grid block (1 MB bf16)


def _kernel(seed_ref, x_ref, o_ref, *, threshold, inv_keep):
    # Mosaic allows at most 2 seed words: fold the block index into the
    # second one so every grid block draws an independent stream
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)  # int32 bits
    # uint32 compare: bias both sides by 2**31 to compare as int32
    keep = (bits ^ jnp.int32(-2147483648)) >= jnp.int32(threshold)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype),
                           jnp.zeros_like(x))


def _kernel3(seed_ref, x_ref, o_ref, *, threshold, inv_keep):
    """3D-grid variant: block stream id folds both grid axes."""
    bid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + bid)
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = (bits ^ jnp.int32(-2147483648)) >= jnp.int32(threshold)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype),
                           jnp.zeros_like(x))


def _run(x, seed, rate, interpret):
    if interpret:
        # pltpu.prng_* has no CPU lowering; off-TPU use threefry with
        # the same seed-determines-mask contract (bits differ from the
        # hardware PRNG, semantics identical)
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        key = jax.random.fold_in(key, seed[1])
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x * jnp.asarray(1.0 / (1.0 - rate),
                                               x.dtype),
                         jnp.zeros_like(x))
    orig_shape = x.shape
    thr_u = min(int(rate * 4294967296.0), 4294967295)
    thr_i32 = thr_u - 2147483648
    kern = functools.partial(_kernel, threshold=thr_i32,
                             inv_keep=1.0 / (1.0 - rate))
    if len(orig_shape) >= 3:
        # keep the last TWO dims intact (only they carry the tiled
        # layout) and collapse the leading ones — truly layout-free.
        # Collapsing into the second-minor dim instead (e.g.
        # (96, 399, 2048) → (38304, 2048)) repacks every odd-sized
        # sublane block: ~23 ms per call at the flagship shape.
        B = 1
        for d in orig_shape[:-2]:
            B *= d
        M, K = orig_shape[-2], orig_shape[-1]
        x3 = x.reshape(B, M, K)
        rows = max((BLOCK_ELEMS // max(K, 1)) // 8 * 8, 8)
        rows = min(rows, M)
        nblocks = -(-M // rows)
        out = pl.pallas_call(
            functools.partial(_kernel3, threshold=thr_i32,
                              inv_keep=1.0 / (1.0 - rate)),
            grid=(B, nblocks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rows, K), lambda b, i: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, K), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, M, K), x.dtype),
            interpret=interpret,
        )(seed, x3)
        return out.reshape(orig_shape)
    K = orig_shape[-1] if len(orig_shape) > 1 else x.size
    M = max(x.size // max(K, 1), 1)
    x2 = x.reshape(M, K)
    rows = max((BLOCK_ELEMS // max(K, 1)) // 8 * 8, 8)
    rows = min(rows, M)
    nblocks = -(-M // rows)
    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, K), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, K), x.dtype),
        interpret=interpret,
    )(seed, x2)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_dropout(x, seed, rate, interpret=False):
    """Dropout with on-chip PRNG. seed: (2,) int32; rate: static float.

    The same (seed, shape) always produces the same mask, which is what
    makes the storage-free VJP and remat-recompute exact."""
    return _run(x, seed, rate, interpret)


def _fwd(x, seed, rate, interpret):
    return _run(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    return _run(g, seed, rate, interpret), None


fused_dropout.defvjp(_fwd, _bwd)


def key_to_seed(key):
    """PRNG key → (2,) int32 seed for fused_dropout."""
    data = jax.random.key_data(key).reshape(-1)[:2]
    return data.astype(jnp.uint32).view(jnp.int32)
