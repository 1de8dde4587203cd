"""Ablate the decomp attention fwd kernel to locate the bottleneck.

Standalone kernel variants (same structure as _fwd_kernel_decomp) with
pieces removed. Times are per-call, batch 128 x T'=400 x 8 heads.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cat_tpu.ops.attention_pallas import _build_u, _decomp_tables


def make_kernel(variant, b, D, NB):
    def kern(q_ref, k_ref, v_ref, w_ref, a_ref, b_ref, c_ref, vt_ref,
             o_ref, *, scale=0.125):
        q = q_ref[:, 0]
        k = k_ref[:, 0]
        v = v_ref[:, 0]
        w = w_ref[0]
        Dh = q.shape[-1]
        batched = (((2,), (2,)), ((0,), (0,)))
        if variant in ("full", "no_bd", "no_softmax", "ac_only"):
            s = jax.lax.dot_general(q, k, batched,
                                    preferred_element_type=jnp.float32)
        else:
            s = jnp.zeros((NB, b, b), jnp.float32)
        if variant in ("full", "no_softmax", "bd_only"):
            qv2 = q.reshape(NB * b, Dh)
            r = jax.lax.dot_general(qv2, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            u = _build_u(r.reshape(NB, b, D),
                         a_ref[...].astype(jnp.float32),
                         b_ref[...].astype(jnp.float32),
                         c_ref[...].astype(jnp.float32), D)
            bd = jax.lax.dot_general(
                u.reshape(NB * b, D).astype(vt_ref.dtype), vt_ref[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = (s + bd.reshape(NB, b, b)) * scale
        if variant == "bd_matmul_only":
            # bd matmul with precomputed-style u (= q reused, no build)
            qv2 = q.reshape(NB * b, Dh)
            r = jax.lax.dot_general(qv2, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(
                r.astype(vt_ref.dtype), vt_ref[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bd.reshape(NB, b, b)
        if variant in ("full", "no_bd"):
            m = jnp.max(s, axis=2, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=2, keepdims=True)
            e = e / jnp.maximum(l, 1e-30)
        else:
            e = s
        acc = jax.lax.dot_general(e.astype(v.dtype), v,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[:, 0] = acc.astype(o_ref.dtype)
    return kern


def run(variant, NB=2):
    N, T, H, Dh, D = 128, 400, 8, 64, 512
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    k = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    v = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    w = jnp.asarray(rng.standard_normal((H, Dh, D)) * 0.2, dt)
    a, b_t, c, vt = (jnp.asarray(x).astype(dt)
                     for x in _decomp_tables(T, D))
    kern = make_kernel(variant, T, D, NB)
    call = pl.pallas_call(
        kern,
        grid=(H, N // NB),
        in_specs=[
            pl.BlockSpec((NB, 1, T, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, T, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((NB, 1, T, Dh), lambda h, nb: (nb, h, 0, 0)),
            pl.BlockSpec((1, Dh, D), lambda h, nb: (h, 0, 0)),
            pl.BlockSpec((T, D), lambda h, nb: (0, 0)),
            pl.BlockSpec((T, D), lambda h, nb: (0, 0)),
            pl.BlockSpec((T, D), lambda h, nb: (0, 0)),
            pl.BlockSpec((T, D), lambda h, nb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NB, 1, T, Dh),
                               lambda h, nb: (nb, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, T, Dh), dt),
    )

    @jax.jit
    def f(q, k, v, w):
        return jnp.sum(call(q, k, v, w, a, b_t, c, vt)
                       .astype(jnp.float32))

    float(f(q, k, v, w))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(q, k, v, w)
        float(r)  # block_until_ready is unreliable on this backend
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"{variant:16s} NB={NB}: {best*1e3:6.2f} ms")


if __name__ == "__main__":
    for v in ["full", "no_bd", "bd_only", "bd_matmul_only",
              "no_softmax", "ac_only"]:
        run(v)
