"""Component-level step-time breakdown at the flagship shape.

Times standalone jitted fwd+bwd programs for each piece of the encoder
step, so the 'fixed' (non-cell) cost seen in bench_profile can be
attributed. Prints one JSON line per part.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "96"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "1600"))
HDIM = int(os.environ.get("BENCH_HDIM", "512"))
STEPS = int(os.environ.get("BENCH_STEPS", "8"))
ONLY = [a for a in sys.argv[1:]]


def timeit(fn, *args):
    out = fn(*args)
    jax_flat = [x for x in _leaves(out)]
    float(np.asarray(jax_flat[0]).ravel()[0])
    t0 = time.time()
    for _ in range(STEPS):
        out = fn(*args)
    jax_flat = [x for x in _leaves(out)]
    float(np.asarray(jax_flat[0]).ravel()[0])
    return (time.time() - t0) / STEPS * 1000


def _leaves(out):
    import jax
    return jax.tree_util.tree_leaves(out)


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cat_tpu.models.layers import (Conv2dSubsampling, ConformerCell,
                                       FFModule, ConvModule,
                                       RelPositionMultiHeadAttention,
                                       length_mask)
    from cat_tpu.ops.specaug import specaug

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {}

    Tp = ((FRAMES - 1) // 2 - 1) // 2  # post-subsample frames (~399)

    def report(name, ms):
        print(json.dumps({"part": name, "ms": round(ms, 1)}), flush=True)

    # --- specaug ---
    if not ONLY or "specaug" in ONLY:
        feats = jnp.asarray(rng.standard_normal(
            (BATCH, FRAMES, 80)).astype(np.float32))
        lens = jnp.full((BATCH,), FRAMES, jnp.int32)
        f = jax.jit(lambda k, x: specaug(k, x, lens, num_freq_masks=2,
                                         freq_mask_width=27,
                                         num_time_masks=2,
                                         time_mask_width=100))
        report("specaug", timeit(f, key, feats))

    # --- conv subsampling fwd+bwd ---
    if not ONLY or "subsampling" in ONLY:
        sub = Conv2dSubsampling(HDIM, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal(
            (BATCH, FRAMES, 80)).astype(np.float32))
        lens = jnp.full((BATCH,), FRAMES, jnp.int32)
        params = jax.jit(sub.init)(key, x, lens)

        @jax.jit
        def f(p, x):
            def loss(p):
                h, _ = sub.apply(p, x, lens)
                return jnp.sum(h.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(p)
            return l, g

        report("subsampling_fwdbwd", timeit(f, params, x))

        @jax.jit
        def ffwd(p, x):
            h, _ = sub.apply(p, x, lens)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        report("subsampling_fwd", timeit(ffwd, params, x))

    # --- one conformer cell fwd+bwd (post-subsample shape) ---
    h0 = jnp.asarray(rng.standard_normal(
        (BATCH, Tp, HDIM)).astype(np.float32)).astype(jnp.bfloat16)
    clens = jnp.full((BATCH,), Tp, jnp.int32)
    if not ONLY or "cell" in ONLY:
        cell = ConformerCell(d_model=HDIM, num_heads=8, kernel_size=32,
                             dropout_rate=0.0, dtype=jnp.bfloat16)
        params = jax.jit(partial(cell.init, deterministic=True))(
            key, h0, clens)

        @jax.jit
        def f(v, x):
            def loss(v):
                out = cell.apply(v, x, clens, True)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(v)

        report("cell_fwdbwd_nodrop", timeit(f, params, h0))

    # --- attention module alone ---
    if not ONLY or "attn" in ONLY:
        mask = length_mask(clens, Tp)
        attn = RelPositionMultiHeadAttention(
            num_heads=8, d_model=HDIM, dropout_rate=0.0,
            dtype=jnp.bfloat16)
        params = jax.jit(partial(attn.init, deterministic=True))(
            key, h0, mask)

        @jax.jit
        def f(v, x):
            def loss(v):
                out = attn.apply(v, x, mask, True)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(v)

        report("attn_fwdbwd", timeit(f, params, h0))

    # --- FF module alone ---
    if not ONLY or "ff" in ONLY:
        ff = FFModule(d_model=HDIM, expansion=4, dropout_rate=0.0,
                      dtype=jnp.bfloat16)
        params = jax.jit(partial(ff.init, deterministic=True))(key, h0)

        @jax.jit
        def f(v, x):
            def loss(v):
                out = ff.apply(v, x, True)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(v)

        report("ff_fwdbwd", timeit(f, params, h0))

    # --- conv module alone ---
    if not ONLY or "conv" in ONLY:
        mask = length_mask(clens, Tp)
        conv = ConvModule(d_model=HDIM, kernel_size=32, dropout_rate=0.0,
                          use_batchnorm=True, dtype=jnp.bfloat16)
        vs = jax.jit(partial(conv.init, deterministic=True))(
            key, h0, mask)

        @jax.jit
        def f(vs, x):
            def loss(p):
                out, _ = conv.apply(
                    {"params": p, "batch_stats": vs["batch_stats"]},
                    x, mask, False, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(vs["params"])

        report("conv_fwdbwd", timeit(f, vs, h0))

    # --- classifier head + log_softmax + mean ---
    if not ONLY or "head" in ONLY:
        dense = nn.Dense(72)
        params = jax.jit(dense.init)(key, h0.astype(jnp.float32))

        @jax.jit
        def f(p, x):
            def loss(p):
                logits = dense.apply(p, x.astype(jnp.float32))
                return jnp.mean(jax.nn.log_softmax(logits, -1))
            return jax.value_and_grad(loss)(p)

        report("head_logsoftmax", timeit(f, params, h0))

    # --- optimizer update over flagship-sized params ---
    if not ONLY or "opt" in ONLY:
        import optax
        n_params = 110_000_000
        p = {"w": jnp.zeros((n_params // 64, 64), jnp.float32)}
        tx = optax.adam(1e-3)
        st = tx.init(p)

        @jax.jit
        def f(p, st):
            g = jax.tree_util.tree_map(jnp.ones_like, p)
            up, st2 = tx.update(g, st, p)
            return optax.apply_updates(p, up), st2

        report("adam_110M", timeit(f, p, st))


if __name__ == "__main__":
    main()
