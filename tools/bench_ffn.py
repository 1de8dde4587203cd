"""A/B the fused FF kernel vs the stock XLA module at the flagship
shape (N=128, T'=399, D=512, F=2048, bf16, dropout 0.1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, reps=30):
    r = fn(*args, jnp.float32(0))
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for j in range(reps):
            r = fn(*args, jnp.float32(j))
        float(r)  # block_until_ready is unreliable on this backend
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    from cat_tpu.models.layers import FFModule
    N, T, D = 128, 399, 512
    rate = float(os.environ.get("AB_RATE", "0.1"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, D)), dt)
    mod = FFModule(d_model=D, expansion=4, dropout_rate=rate,
                   dtype=dt, residual_alpha=0.5)
    params = jax.jit(lambda: mod.init(
        {"params": jax.random.PRNGKey(0)}, x))()

    for mode in ("", "1"):
        os.environ["CAT_TPU_FUSED_FFN"] = mode
        det = rate <= 0.0

        @jax.jit
        def f(params, x, i):
            kw = {} if det else {"rngs": {
                "dropout": jax.random.PRNGKey(3)}}
            return jnp.sum(mod.apply(
                params, x + i.astype(dt),
                deterministic=det, **kw).astype(jnp.float32))

        @jax.jit
        def g(params, x, i):
            kw = {} if det else {"rngs": {
                "dropout": jax.random.PRNGKey(3)}}

            def loss(params, x):
                return jnp.sum(mod.apply(
                    params, x + i.astype(dt), deterministic=det,
                    **kw).astype(jnp.float32))
            gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
            acc = jnp.sum(gx.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(gp):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc

        fms = timeit(f, (params, x))
        gms = timeit(g, (params, x))
        name = "fused" if mode == "1" else "xla  "
        print(f"{name} rate={rate}: fwd {fms:.2f} ms, "
              f"fwd+bwd(x) {gms:.2f} ms   (34 FF/step: "
              f"fwd {34*fms:.0f} / both {34*gms:.0f} ms)")


if __name__ == "__main__":
    main()
