"""Fused conformer convolution-module stages (Pallas, TPU).

The conv module (models/layers.py ConvModule; role reference
/root/reference/cat/shared/layer.py:476-533) interleaves elementwise
chains with two ops that are best left to XLA: the depthwise time-conv
(a conv_general_dilated that XLA schedules well) and the masked batch
statistics (a global (N, T) reduction — inherently two-pass). So the
fusion splits at those seams:

  K1 (glu_in):  LN → Dense(2D) → GLU → time-mask      (one pass)
  XLA        :  depthwise conv → masked batch stats
  K2 (bn_out):  BN-normalize → SiLU → Dense(D) → dropout → mask →
                residual add                          (one pass)

Each K is a custom-VJP pallas_call pair following the same recipe as
ops/ffn_pallas.py: weights DMA'd to VMEM scratch once, f32 weight-grad
accumulators across row tiles, dropout masks regenerated from per-tile
hardware-PRNG seeds, backward recomputes the forward chain from its
inputs (nothing saved — `flash_only`-policy-friendly).

K2's custom backward also emits d(mean)/d(var) for the batch-statistics
inputs, so XLA's autodiff completes the stats → conv-output gradient
chain outside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cat_tpu.ops.attention_pallas import _dropout_keep, _thr
from cat_tpu.ops.ffn_pallas import (_load_w_once, _pick_br, LN_EPS,
                                    VMEM_LIMIT)

BN_EPS = 1e-5


def _ln_fwd(xf, gamma, beta):
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (xf - mean) * rstd
    return xhat * gamma + beta, xhat, rstd


# ---------------- K1: LN → Dense(2D) → GLU → mask ----------------


def _glu_in_fwd_kernel(x_ref, m_ref, g_ref, b_ref, w_ref, bw_ref,
                       o_ref, ws, sem, *, BR, D):
    i = pl.program_id(0)
    _load_w_once(i == 0, (w_ref,), (ws,), sem)
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    h, _, _ = _ln_fwd(xf, g_ref[...].astype(jnp.float32),
                      b_ref[...].astype(jnp.float32))
    h2 = jax.lax.dot_general(h.astype(x.dtype), ws[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = h2 + bw_ref[...].astype(jnp.float32)
    u, g_ = h2[:, :D], h2[:, D:]
    a = u * jax.nn.sigmoid(g_)
    o_ref[...] = (a * m_ref[...].astype(jnp.float32)).astype(
        o_ref.dtype)


def _glu_in_bwd_kernel(x_ref, m_ref, g_ref, b_ref, w_ref, bw_ref,
                       do_ref,
                       dx_ref, dg_ref, db_ref, dw_ref, dbw_ref,
                       ws, dws, dbws, dgs, dbs, sem, *, BR, D):
    i = pl.program_id(0)
    _load_w_once(i == 0, (w_ref,), (ws,), sem)

    @pl.when(i == 0)
    def _init():
        dws[...] = jnp.zeros_like(dws)
        dbws[...] = jnp.zeros_like(dbws)
        dgs[...] = jnp.zeros_like(dgs)
        dbs[...] = jnp.zeros_like(dbs)

    x = x_ref[...]
    xf = x.astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    beta = b_ref[...].astype(jnp.float32)
    h, xhat, rstd = _ln_fwd(xf, gamma, beta)
    hl = h.astype(x.dtype)
    h2 = jax.lax.dot_general(hl, ws[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = h2 + bw_ref[...].astype(jnp.float32)
    u, g_ = h2[:, :D], h2[:, D:]
    sig = jax.nn.sigmoid(g_)

    da = do_ref[...].astype(jnp.float32) * m_ref[...].astype(
        jnp.float32)
    du = da * sig
    dg_ = da * u * sig * (1.0 - sig)
    dh2 = jnp.concatenate([du, dg_], axis=1)
    dbws[...] += jnp.sum(dh2, axis=0, keepdims=True)
    dh2l = dh2.astype(x.dtype)
    dws[...] += jax.lax.dot_general(
        hl, dh2l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(dh2l, ws[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dgs[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbs[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxh = dh * gamma
    m1 = jnp.mean(dxh, axis=1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (dxh - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        dw_ref[...] = dws[...]
        dbw_ref[...] = dbws[...]
        dg_ref[...] = dgs[...]
        db_ref[...] = dbs[...]


def _glu_in_pallas(x, m, gamma, beta, w, bw, interpret):
    R, D = x.shape
    BR = _pick_br(R)
    kernel = functools.partial(_glu_in_fwd_kernel, BR=BR, D=D)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((BR, 1), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2 * D), const),
        ],
        out_specs=pl.BlockSpec((BR, D), row),
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((D, 2 * D), w.dtype),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, m, gamma, beta, w, bw)


def _glu_in_bwd_pallas(x, m, gamma, beta, w, bw, do, interpret):
    R, D = x.shape
    BR = _pick_br(R)
    f32 = jnp.float32
    kernel = functools.partial(_glu_in_bwd_kernel, BR=BR, D=D)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((BR, 1), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2 * D), const),
            pl.BlockSpec((BR, D), row),
        ],
        out_specs=[
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((D, 2 * D), const),
            pl.BlockSpec((1, 2 * D), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, 2 * D), f32),
            jax.ShapeDtypeStruct((1, 2 * D), f32),
        ],
        scratch_shapes=[pltpu.VMEM((D, 2 * D), w.dtype),
                        pltpu.VMEM((D, 2 * D), f32),
                        pltpu.VMEM((1, 2 * D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, m, gamma, beta, w, bw, do)


from cat_tpu.ops.partitioning import (make_row_partitioned,
                                      use_partitioned)

_glu_in_part = make_row_partitioned(
    _glu_in_pallas, static_argnums=(6,), row_args=(0, 1),
    out_specs=("row",),
    rule="i d, i m1, g1 d, g2 d, wa wf, ba wf -> i d")
_glu_in_bwd_part = make_row_partitioned(
    _glu_in_bwd_pallas, static_argnums=(7,), row_args=(0, 1, 6),
    out_specs=("row", "psum", "psum", "psum", "psum"),
    rule="i d, i m1, g1 d, g2 d, wa wf, ba wf, i d "
         "-> i d, o1 od, o2 od2, owa owf, oba obf")


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _glu_in_core(x, m, gamma, beta, w, bw, interpret):
    f = _glu_in_part if use_partitioned() else _glu_in_pallas
    return f(x, m, gamma, beta, w, bw, interpret)


def _glu_in_core_fwd(x, m, gamma, beta, w, bw, interpret):
    f = _glu_in_part if use_partitioned() else _glu_in_pallas
    o = f(x, m, gamma, beta, w, bw, interpret)
    return o, (x, m, gamma, beta, w, bw)


def _glu_in_core_bwd(interpret, res, g):
    x, m, gamma, beta, w, bw = res
    f = _glu_in_bwd_part if use_partitioned() else _glu_in_bwd_pallas
    dx, dg, db, dw, dbw = f(
        x, m, gamma, beta, w, bw, g.astype(x.dtype), interpret)
    return (dx, None, dg.astype(gamma.dtype), db.astype(beta.dtype),
            dw.astype(w.dtype), dbw.astype(bw.dtype))


_glu_in_core.defvjp(_glu_in_core_fwd, _glu_in_core_bwd)


# ------- K2: BN-norm → SiLU → Dense(D) → dropout → mask → +x -------


def _bn_out_fwd_kernel(seed_ref, c_ref, x_ref, m_ref, mu_ref, var_ref,
                       s_ref, bb_ref, w_ref, bw_ref, o_ref, ws, sem,
                       *, rate, BR, D):
    i = pl.program_id(0)
    _load_w_once(i == 0, (w_ref,), (ws,), sem)
    c = c_ref[...].astype(jnp.float32)
    rstd = jax.lax.rsqrt(var_ref[...].astype(jnp.float32) + BN_EPS)
    xn = (c - mu_ref[...].astype(jnp.float32)) * rstd
    y = xn * s_ref[...].astype(jnp.float32) \
        + bb_ref[...].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    h = jax.lax.dot_general(y.astype(o_ref.dtype), ws[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + bw_ref[...].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + i)
        keep = _dropout_keep((BR, D), _thr(rate))
        h = jnp.where(keep, h * (1.0 / (1.0 - rate)), 0.0)
    h = h * m_ref[...].astype(jnp.float32)
    o_ref[...] = (x_ref[...].astype(jnp.float32) + h).astype(
        o_ref.dtype)


def _bn_out_bwd_kernel(seed_ref, c_ref, x_ref, m_ref, mu_ref, var_ref,
                       s_ref, bb_ref, w_ref, bw_ref, do_ref,
                       dc_ref, dmu_ref, dvar_ref, ds_ref, dbb_ref,
                       dw_ref, dbw_ref,
                       ws, dws, dbws, dmus, dvars, dss, dbbs, sem,
                       *, rate, BR, D):
    i = pl.program_id(0)
    _load_w_once(i == 0, (w_ref,), (ws,), sem)

    @pl.when(i == 0)
    def _init():
        dws[...] = jnp.zeros_like(dws)
        dbws[...] = jnp.zeros_like(dbws)
        dmus[...] = jnp.zeros_like(dmus)
        dvars[...] = jnp.zeros_like(dvars)
        dss[...] = jnp.zeros_like(dss)
        dbbs[...] = jnp.zeros_like(dbbs)

    c = c_ref[...].astype(jnp.float32)
    mu = mu_ref[...].astype(jnp.float32)
    var = var_ref[...].astype(jnp.float32)
    scale = s_ref[...].astype(jnp.float32)
    rstd = jax.lax.rsqrt(var + BN_EPS)
    xn = (c - mu) * rstd
    y0 = xn * scale + bb_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(y0)
    y = y0 * sig
    yl = y.astype(x_ref.dtype)

    dh = do_ref[...].astype(jnp.float32) * m_ref[...].astype(
        jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + i)
        keep = _dropout_keep((BR, D), _thr(rate))
        dh = jnp.where(keep, dh * (1.0 / (1.0 - rate)), 0.0)
    dbws[...] += jnp.sum(dh, axis=0, keepdims=True)
    dhl = dh.astype(x_ref.dtype)
    dws[...] += jax.lax.dot_general(
        yl, dhl, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy = jax.lax.dot_general(dhl, ws[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dy0 = dy * sig * (1.0 + y0 * (1.0 - sig))
    dss[...] += jnp.sum(dy0 * xn, axis=0, keepdims=True)
    dbbs[...] += jnp.sum(dy0, axis=0, keepdims=True)
    dxn = dy0 * scale
    dc_ref[...] = (dxn * rstd).astype(dc_ref.dtype)
    dmus[...] += jnp.sum(-dxn * rstd, axis=0, keepdims=True)
    dvars[...] += jnp.sum(dxn * (c - mu), axis=0, keepdims=True) \
        * (-0.5) * rstd * rstd * rstd

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        dw_ref[...] = dws[...]
        dbw_ref[...] = dbws[...]
        dmu_ref[...] = dmus[...]
        dvar_ref[...] = dvars[...]
        ds_ref[...] = dss[...]
        dbb_ref[...] = dbbs[...]


def _bn_out_pallas(seed, c, x, m, mu, var, scale, bias, w, bw, rate,
                   interpret):
    R, D = x.shape
    BR = _pick_br(R)
    kernel = functools.partial(_bn_out_fwd_kernel, rate=rate, BR=BR,
                               D=D)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((BR, 1), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D), const),
        ],
        out_specs=pl.BlockSpec((BR, D), row),
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((D, D), w.dtype),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, c, x, m, mu, var, scale, bias, w, bw)


def _bn_out_bwd_pallas(seed, c, x, m, mu, var, scale, bias, w, bw, do,
                       rate, interpret):
    R, D = x.shape
    BR = _pick_br(R)
    f32 = jnp.float32
    kernel = functools.partial(_bn_out_bwd_kernel, rate=rate, BR=BR,
                               D=D)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((BR, 1), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((BR, D), row),
        ],
        out_specs=[
            pl.BlockSpec((BR, D), row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((D, D), const),
            pl.BlockSpec((1, D), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        scratch_shapes=[pltpu.VMEM((D, D), w.dtype),
                        pltpu.VMEM((D, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.VMEM((1, D), f32),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(seed, c, x, m, mu, var, scale, bias, w, bw, do)


_bn_out_part = make_row_partitioned(
    _bn_out_pallas, static_argnums=(10, 11), row_args=(1, 2, 3),
    seed_arg=0,
    out_specs=("row",),
    rule="sd, i d, i d, i m1, u1 d, v1 d, s1 d, bb1 d, wa wb, bw1 d "
         "-> i d")
_bn_out_bwd_part = make_row_partitioned(
    _bn_out_bwd_pallas, static_argnums=(11, 12), row_args=(1, 2, 3, 10),
    seed_arg=0,
    out_specs=("row", "psum", "psum", "psum", "psum", "psum", "psum"),
    rule="sd, i d, i d, i m1, u1 d, v1 d, s1 d, bb1 d, wa wb, bw1 d, "
         "i d -> i d, a1 ad, a2 ad2, a3 ad3, a4 ad4, awa awb, ab1 abd")


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _bn_out_core(seed, c, x, m, mu, var, scale, bias, w, bw, rate,
                 interpret):
    f = _bn_out_part if use_partitioned() else _bn_out_pallas
    return f(seed, c, x, m, mu, var, scale, bias, w, bw, rate,
             interpret)


def _bn_out_core_fwd(seed, c, x, m, mu, var, scale, bias, w, bw, rate,
                     interpret):
    f = _bn_out_part if use_partitioned() else _bn_out_pallas
    o = f(seed, c, x, m, mu, var, scale, bias, w, bw, rate, interpret)
    return o, (seed, c, x, m, mu, var, scale, bias, w, bw)


def _bn_out_core_bwd(rate, interpret, res, g):
    seed, c, x, m, mu, var, scale, bias, w, bw = res
    f = _bn_out_bwd_part if use_partitioned() else _bn_out_bwd_pallas
    dc, dmu, dvar, dscale, dbias, dw, dbw = f(
        seed, c, x, m, mu, var, scale, bias, w, bw, g.astype(x.dtype),
        rate, interpret)
    return (None, dc, g, None, dmu.reshape(mu.shape),
            dvar.reshape(var.shape), dscale.reshape(scale.shape),
            dbias.reshape(bias.shape), dw.astype(w.dtype),
            dbw.astype(bw.dtype))


_bn_out_core.defvjp(_bn_out_core_fwd, _bn_out_core_bwd)


def _flatten(x, BRQ=128):
    shape = x.shape
    D = shape[-1]
    R = int(np.prod(shape[:-1]))
    xr = x.reshape(R, D)
    Rp = -(-R // BRQ) * BRQ
    if Rp != R:
        xr = jnp.pad(xr, ((0, Rp - R), (0, 0)))
    return xr, R, Rp, shape


def fused_glu_in(x, mask, gamma, beta, w, b, *, interpret=False):
    """masked GLU input stage: GLU(LN(x) @ w + b) * mask.

    x (..., D); mask broadcastable to x[..., 0]; w (D, 2D); b (2D,).
    """
    D = x.shape[-1]
    xr, R, Rp, shape = _flatten(x)
    mr = jnp.broadcast_to(mask[..., None], shape[:-1] + (1,)).reshape(
        R, 1).astype(jnp.float32)
    if Rp != R:
        mr = jnp.pad(mr, ((0, Rp - R), (0, 0)))
    out = _glu_in_core(xr, mr, gamma.reshape(1, D), beta.reshape(1, D),
                       w.astype(x.dtype), b.reshape(1, 2 * D),
                       interpret)
    return out[:R].reshape(shape)


def fused_bn_out(conv, x, mask, mean, var, scale, bias, w, b, *,
                 dropout_rate=0.0, seed=None, interpret=False):
    """output stage: x + mask * drop(silu(bn(conv)) @ w + b)."""
    D = x.shape[-1]
    cr, R, Rp, shape = _flatten(conv)
    xr, _, _, _ = _flatten(x)
    mr = jnp.broadcast_to(mask[..., None], shape[:-1] + (1,)).reshape(
        R, 1).astype(jnp.float32)
    if Rp != R:
        mr = jnp.pad(mr, ((0, Rp - R), (0, 0)))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    out = _bn_out_core(seed, cr.astype(x.dtype), xr, mr,
                       mean.reshape(1, D), var.reshape(1, D),
                       scale.reshape(1, D), bias.reshape(1, D),
                       w.astype(x.dtype), b.reshape(1, D),
                       float(dropout_rate), interpret)
    return out[:R].reshape(shape)
