"""Fused conformer feed-forward module (Pallas, TPU).

The FF module (models/layers.py FFModule; role reference
/root/reference/cat/shared/layer.py:424-451) is, in XLA-land, a chain of
LayerNorm → Dense(4D) → SiLU → Dropout → Dense(D) → Dropout → ½-residual.
At the flagship shape every elementwise stage is a separate HBM pass over
an (N·T, 4D) or (N·T, D) tensor: the round-3 device trace attributes
~200 ms/step (loop fusions + fused-dropout kernels) to exactly this
class of traffic, and under the `flash_only` remat policy the whole
chain is recomputed again in the backward pass.

This kernel runs the entire module in VMEM row-tiles:

* forward: one pass — LN statistics, both matmuls, SiLU, both hardware-
  PRNG dropouts and the α-residual add, with only x read and out written
  to HBM. Weights are DMA'd to VMEM scratch once (first grid step), not
  per-tile.
* backward: one pass that recomputes the forward chain from x (nothing
  is saved — same policy as `flash_only`) and produces dx plus all six
  parameter grads, with dW1/dW2 accumulated in f32 VMEM scratch across
  row-tiles and flushed on the last tile. Dropout masks are regenerated
  from per-(tile, layer) PRNG seeds, never stored.

Numerics: LN statistics and matmul accumulations in f32 (MXU operands
bf16), matching the XLA module within bf16 tolerance; dropout uses the
same keep-threshold convention as ops/dropout_pallas.py.

VMEM: the weight + dW1/dW2 scratch is ~12 MB for D=512, F=4D; tiles are
sized so the total stays under the raised `vmem_limit_bytes` (the
default 16 MB scoped limit is a compiler default, not a hard physical
bound on this part — validated empirically by the A/B below).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cat_tpu.ops.attention_pallas import _dropout_keep, _thr

LN_EPS = 1e-6
VMEM_LIMIT = 64 * 1024 * 1024


def _ln(xf, gamma, beta):
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (xf - mean) * rstd
    return xhat * gamma + beta, xhat, rstd


def _silu(h1):
    sig = jax.nn.sigmoid(h1)
    return h1 * sig, sig


def _keep(seed_ref, tile, layer, rate, shape):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + 2 * tile + layer)
    return _dropout_keep(shape, _thr(rate))


def _load_w_once(first, srcs, dsts, sem):
    @pl.when(first)
    def _():
        for i, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(src, dst, sem.at[i]).start()
        for i, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(src, dst, sem.at[i]).wait()


def _ff_fwd_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, o_ref, w1s, w2s, sem,
                   *, alpha, rate, BR, D, F):
    i = pl.program_id(0)
    _load_w_once(i == 0, (w1_ref, w2_ref), (w1s, w2s), sem)
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    h, _, _ = _ln(xf, g_ref[...].astype(jnp.float32),
                  b_ref[...].astype(jnp.float32))
    h1 = jax.lax.dot_general(h.astype(x.dtype), w1s[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    s1, _ = _silu(h1)
    if rate > 0.0:
        inv = 1.0 / (1.0 - rate)
        k1 = _keep(seed_ref, i, 0, rate, (BR, F))
        s1 = jnp.where(k1, s1 * inv, 0.0)
    h2 = jax.lax.dot_general(s1.astype(x.dtype), w2s[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = h2 + b2_ref[...].astype(jnp.float32)
    if rate > 0.0:
        k2 = _keep(seed_ref, i, 1, rate, (BR, D))
        h2 = jnp.where(k2, h2 * inv, 0.0)
    o_ref[...] = (xf + alpha * h2).astype(o_ref.dtype)


def _ff_bwd_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, do_ref,
                   dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                   db2_ref,
                   w1s, w2s, dw1s, db1s, dw2s, db2s, dgs, dbs, sem,
                   *, alpha, rate, BR, D, F):
    i = pl.program_id(0)
    _load_w_once(i == 0, (w1_ref, w2_ref), (w1s, w2s), sem)

    @pl.when(i == 0)
    def _init():
        dw1s[...] = jnp.zeros_like(dw1s)
        db1s[...] = jnp.zeros_like(db1s)
        dw2s[...] = jnp.zeros_like(dw2s)
        db2s[...] = jnp.zeros_like(db2s)
        dgs[...] = jnp.zeros_like(dgs)
        dbs[...] = jnp.zeros_like(dbs)

    x = x_ref[...]
    do = do_ref[...].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    beta = b_ref[...].astype(jnp.float32)
    h, xhat, rstd = _ln(xf, gamma, beta)
    hl = h.astype(x.dtype)
    h1 = jax.lax.dot_general(hl, w1s[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    s1, sig = _silu(h1)
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    if rate > 0.0:
        k1 = _keep(seed_ref, i, 0, rate, (BR, F))
        a1 = jnp.where(k1, s1 * inv, 0.0)
    else:
        a1 = s1
    a1l = a1.astype(x.dtype)

    # upstream: out = x + alpha * drop2(h2)
    dh2 = alpha * do
    if rate > 0.0:
        k2 = _keep(seed_ref, i, 1, rate, (BR, D))
        dh2 = jnp.where(k2, dh2 * inv, 0.0)
    db2s[...] += jnp.sum(dh2, axis=0, keepdims=True)
    dh2l = dh2.astype(x.dtype)
    dw2s[...] += jax.lax.dot_general(
        a1l, dh2l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da1 = jax.lax.dot_general(dh2l, w2s[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        da1 = jnp.where(k1, da1 * inv, 0.0)
    dh1 = da1 * sig * (1.0 + h1 * (1.0 - sig))
    db1s[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dh1l = dh1.astype(x.dtype)
    dw1s[...] += jax.lax.dot_general(
        hl, dh1l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(dh1l, w1s[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dgs[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbs[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxh = dh * gamma
    m1 = jnp.mean(dxh, axis=1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=1, keepdims=True)
    dx_ln = rstd * (dxh - m1 - xhat * m2)
    dx_ref[...] = (do + dx_ln).astype(dx_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        dw1_ref[...] = dw1s[...]
        db1_ref[...] = db1s[...]
        dw2_ref[...] = dw2s[...]
        db2_ref[...] = db2s[...]
        dg_ref[...] = dgs[...]
        db_ref[...] = dbs[...]


def _pick_br(R):
    """One block size for fwd AND bwd (dropout masks are generated per
    row-tile, so the partition must match)."""
    import os
    env = os.environ.get("CAT_TPU_FFN_BR")
    cap = int(env) if env else 256
    for br in (512, 256, 128, 64, 32, 16, 8):
        if br <= cap and R % br == 0:
            return br
    return R


def _fwd(x, gamma, beta, w1, b1, w2, b2, seed, alpha, rate,
         interpret):
    R, D = x.shape
    F = w1.shape[1]
    BR = _pick_br(R)
    kernel = functools.partial(_ff_fwd_kernel, alpha=alpha, rate=rate,
                               BR=BR, D=D, F=F)
    assert R % BR == 0
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, F), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D), const),
        ],
        out_specs=pl.BlockSpec((BR, D), row),
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((D, F), w1.dtype),
                        pltpu.VMEM((F, D), w2.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, gamma, beta, w1, b1, w2, b2)
    return out


def _bwd(x, gamma, beta, w1, b1, w2, b2, seed, do, alpha, rate,
         interpret):
    R, D = x.shape
    F = w1.shape[1]
    BR = _pick_br(R)
    f32 = jnp.float32
    kernel = functools.partial(_ff_bwd_kernel, alpha=alpha, rate=rate,
                               BR=BR, D=D, F=F)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, F), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((BR, D), row),
        ],
        out_specs=[
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((D, F), const),
            pl.BlockSpec((1, F), const),
            pl.BlockSpec((F, D), const),
            pl.BlockSpec((1, D), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        scratch_shapes=[pltpu.VMEM((D, F), w1.dtype),
                        pltpu.VMEM((F, D), w2.dtype),
                        pltpu.VMEM((D, F), f32),
                        pltpu.VMEM((1, F), f32),
                        pltpu.VMEM((F, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, gamma, beta, w1, b1, w2, b2, do)
    return outs


# ---- multi-chip: shard the kernels over the row dim (data axis) ----
#
# GSPMD cannot see inside a pallas_call; without a rule it would
# all-gather the activations around the kernel (the reason round 2/3
# gated the fused paths off under multi-chip). These wrappers declare
# the natural partitioning: x / do / dx sharded on rows, weights and
# their grads replicated (per-shard dW partial sums are psum'd in the
# partitioned backward). Dropout: the shard index is folded into the
# seed (partitioning.offset_seed) so data-parallel shards draw
# independent mask streams; fwd and bwd apply the same offset, so masks
# stay consistent across the pair.

from jax.experimental.custom_partitioning import custom_partitioning


def _row_spec(sharding, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        spec = sharding.spec
    except AttributeError:
        return NamedSharding(mesh, P())
    row = spec[0] if len(spec) > 0 else None
    return NamedSharding(mesh, P(row, None))


def _repl(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def _make_fwd_partitioned():
    cp = custom_partitioning(_fwd, static_argnums=(8, 9, 10))

    def infer(alpha, rate, interpret, mesh, arg_shapes, result_shape):
        return _row_spec(arg_shapes[0].sharding, mesh)

    def partition(alpha, rate, interpret, mesh, arg_shapes,
                  result_shape):
        xs = _row_spec(arg_shapes[0].sharding, mesh)
        arg_sh = (xs,) + tuple(_repl(mesh) for _ in arg_shapes[1:])
        axes = tuple(a for a in (xs.spec[0],) if a is not None)

        def lower(*args):
            from cat_tpu.ops.partitioning import offset_seed
            args = list(args)
            args[7] = offset_seed(args[7], axes)
            return _fwd(*args, alpha, rate, interpret)

        return mesh, lower, xs, arg_sh

    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="i d, g1 d, g2 d, wa f, b1a f, fb db, b2a d, sd "
                      "-> i d")
    return cp


def _make_bwd_partitioned():
    cp = custom_partitioning(_bwd, static_argnums=(9, 10, 11))

    def infer(alpha, rate, interpret, mesh, arg_shapes, result_shape):
        xs = _row_spec(arg_shapes[0].sharding, mesh)
        return (xs,) + tuple(_repl(mesh) for _ in range(6))

    def partition(alpha, rate, interpret, mesh, arg_shapes,
                  result_shape):
        xs = _row_spec(arg_shapes[0].sharding, mesh)
        arg_sh = ((xs,) + tuple(_repl(mesh) for _ in arg_shapes[1:-1])
                  + (xs,))
        out_sh = (xs,) + tuple(_repl(mesh) for _ in range(6))
        axes = tuple(a for a in (xs.spec[0],) if a is not None)

        def lower(*args):
            from cat_tpu.ops.partitioning import offset_seed
            args = list(args)
            args[7] = offset_seed(args[7], axes)
            outs = _bwd(*args, alpha, rate, interpret)
            if axes:
                # param grads are partial sums over this shard's rows
                outs = tuple(o if i == 0 else jax.lax.psum(o, axes)
                             for i, o in enumerate(outs))
            return outs

        return mesh, lower, out_sh, arg_sh

    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="i d, g1 d, g2 d, wa f, b1a f, fb db, b2a d, "
                      "sd, i d -> i d, g1x dx, g2x dx, wax fx, "
                      "b1ax fx, fbx dbx, b2ax dy")
    return cp


_fwd_part = _make_fwd_partitioned()
_bwd_part = _make_bwd_partitioned()


def _use_partitioned():
    from cat_tpu.ops.partitioning import use_partitioned
    return use_partitioned()


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ff_core(x, gamma, beta, w1, b1, w2, b2, seed, alpha, rate,
             interpret):
    f = _fwd_part if _use_partitioned() else _fwd
    return f(x, gamma, beta, w1, b1, w2, b2, seed, alpha, rate,
             interpret)


def _ff_core_fwd(x, gamma, beta, w1, b1, w2, b2, seed, alpha, rate,
                 interpret):
    f = _fwd_part if _use_partitioned() else _fwd
    o = f(x, gamma, beta, w1, b1, w2, b2, seed, alpha, rate, interpret)
    return o, (x, gamma, beta, w1, b1, w2, b2, seed)


def _ff_core_bwd(alpha, rate, interpret, res, g):
    x, gamma, beta, w1, b1, w2, b2, seed = res
    f = _bwd_part if _use_partitioned() else _bwd
    dx, dg, db, dw1, db1, dw2, db2 = f(
        x, gamma, beta, w1, b1, w2, b2, seed, g.astype(x.dtype), alpha,
        rate, interpret)
    return (dx, dg.astype(gamma.dtype), db.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), None)


_ff_core.defvjp(_ff_core_fwd, _ff_core_bwd)


def fused_ff_residual(x, gamma, beta, w1, b1, w2, b2, *, alpha=0.5,
                      dropout_rate=0.0, seed=None, interpret=False):
    """out = x + alpha * drop(W2 @ drop(silu(W1 @ LN(x) + b1)) + b2).

    x: (..., D) — leading dims are flattened to rows. gamma/beta (D,),
    w1 (D, F), b1 (F,), w2 (F, D), b2 (D,). seed: (2,) int32 for the
    dropout PRNG (required if dropout_rate > 0). Weights are cast to
    x.dtype for the MXU; accumulation f32.
    """
    orig_shape = x.shape
    D = orig_shape[-1]
    R = int(np.prod(orig_shape[:-1]))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    xr = x.reshape(R, D)
    Rp = -(-R // 128) * 128
    if Rp != R:
        # zero rows are safe through the whole chain (LN of zeros is
        # finite, grads of padded rows vanish); sliced off below
        xr = jnp.pad(xr, ((0, Rp - R), (0, 0)))
    dt = x.dtype
    out = _ff_core(xr, gamma.reshape(1, D), beta.reshape(1, D),
                   w1.astype(dt), b1.reshape(1, -1),
                   w2.astype(dt), b2.reshape(1, D), seed,
                   float(alpha), float(dropout_rate), interpret)
    return out[:R].reshape(orig_shape)


def ff_reference(x, gamma, beta, w1, b1, w2, b2, alpha=0.5):
    """Pure-XLA reference (no dropout), matching FFModule's math."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    h = (xf - mean) * jax.lax.rsqrt(var + LN_EPS) * gamma + beta
    h = h.astype(x.dtype)
    h1 = (h @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    s1 = h1 * jax.nn.sigmoid(h1)
    h2 = (s1.astype(x.dtype) @ w2.astype(x.dtype)).astype(
        jnp.float32) + b2
    return (xf + alpha * h2).astype(x.dtype)
