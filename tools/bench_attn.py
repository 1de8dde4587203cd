"""A/B the flash rel-pos decomp attention kernel at the flagship shape.

Times fwd and fwd+bwd per NB setting. Reduces outputs to scalars (see
docs/tpu_performance.md — returning large non-128-lane-minor outputs
from a standalone jit costs 200-400 ms/call in result handling).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    N, T, H, Dh, D = 128, 399, 8, 64, 512
    rate = float(os.environ.get("AB_RATE", "0.1"))
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((N, T, H, Dh)), dt)
    k = jnp.asarray(rng.standard_normal((N, T, H, Dh)), dt)
    v = jnp.asarray(rng.standard_normal((N, T, H, Dh)), dt)
    w = jnp.asarray(rng.standard_normal((D, H, Dh)) * 0.2, dt)
    u = jnp.asarray(rng.standard_normal((H, Dh)) * 0.1, dt)
    vb = jnp.asarray(rng.standard_normal((H, Dh)) * 0.1, dt)
    kmask = jnp.ones((N, T), bool)
    seed = jnp.asarray([1, 2], jnp.int32)

    from cat_tpu.ops.attention_pallas import flash_relpos_attention_decomp

    def fwd_loss(q, k, v, w, u, vb):
        o = flash_relpos_attention_decomp(
            q, k, v, w, u, vb, kmask, dropout_rate=rate, seed=seed)
        return jnp.sum(o.astype(jnp.float32))

    jf = jax.jit(fwd_loss)
    jg = jax.jit(jax.grad(fwd_loss, argnums=(0, 1, 2, 3, 4, 5)))

    def timeit(fn, args, reps=20):
        r = fn(*args)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(*args)
            float(r)  # block_until_ready is unreliable on this backend
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    args = (q, k, v, w, u, vb)
    fms = timeit(jf, args)
    def gsum(*a):
        g = jg(*a)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in g)
    gms = timeit(jax.jit(gsum), args)
    nbf = os.environ.get("CAT_TPU_FLASH_NB_FWD", "auto")
    nbb = os.environ.get("CAT_TPU_FLASH_NB_BWD", "auto")
    print(f"NB fwd={nbf} bwd={nbb} rate={rate}: "
          f"fwd {fms:.2f} ms, fwd+bwd {gms:.2f} ms  "
          f"(17 cells: {17*gms:.0f} ms)")


if __name__ == "__main__":
    main()
