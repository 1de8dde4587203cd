"""Step-time breakdown at the flagship bench shape.

Times three jitted train-step variants on the real chip:
  enc   — encoder fwd+bwd only (loss = mean of logits)
  ctc   — encoder + CTC numerator
  crf   — encoder + CTC + dense denominator (the bench program)
Prints one JSON line per variant. Uses the persistent compile cache.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NUM_CELLS = int(os.environ.get("BENCH_CELLS", "17"))
HDIM = int(os.environ.get("BENCH_HDIM", "512"))
VOCAB = 72
BATCH = int(os.environ.get("BENCH_BATCH", "96"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "1600"))
STEPS = int(os.environ.get("BENCH_STEPS", "4"))
ONLY = os.environ.get("BENCH_ONLY", "")  # e.g. "enc" / "ctc" / "crf"
DROPOUT = float(os.environ.get("BENCH_DROPOUT", "0.1"))
REMAT = os.environ.get("BENCH_REMAT", "1") == "1"
BATCHNORM = os.environ.get("BENCH_BATCHNORM", "1") == "1"
SPECAUG = os.environ.get("BENCH_SPECAUG", "1") == "1"


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cat_tpu.ctc.train import build_model, init_state, make_loss_fn, \
        set_lr
    from cat_tpu.fst.ngram import train_ngram
    from cat_tpu.ops.crf_dense import DenseDen
    from cat_tpu.ops.ctc import ctc_loss
    from cat_tpu.utils.scheduler import build_scheduler

    model = build_model(
        {"encoder": {"type": "ConformerNet",
                     "kwargs": {"num_cells": NUM_CELLS, "hdim": HDIM,
                                "num_heads": 8, "kernel_size": 32,
                                "dropout_rate": DROPOUT,
                                "use_batchnorm": BATCHNORM,
                                "dtype": "bfloat16",
                                "scan_layers": os.environ.get("BENCH_SCAN", "0") == "1",
                                "remat": REMAT,
                                # default matches bench.py's flagship
                                "remat_policy": os.environ.get(
                                    "BENCH_REMAT_POLICY",
                                    "flash_only"),
                                "subsampling_remat": os.environ.get(
                                    "BENCH_SUB_REMAT", "0") == "1"}}},
        num_classes=VOCAB)
    _, tx = build_scheduler({
        "type": "SchedulerNoam",
        "kwargs": {"dim_model": HDIM, "warmup_step": 10000,
                   "stop_step": 100000, "peak_factor": 5.0},
        "optimizer": {"type": "Adam",
                      "kwargs": {"lr": 1e-3, "betas": [0.9, 0.98]}}})
    state = init_state(model, tx, feat_dim=80)

    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(1, VOCAB, size=int(rng.integers(5, 30))))
            for _ in range(300)]
    den = DenseDen.from_ngram(train_ngram(seqs, order=3),
                              num_classes=VOCAB)

    batch = {
        "feats": jnp.asarray(
            rng.standard_normal((BATCH, FRAMES, 80)).astype(np.float32)),
        "feat_lengths": jnp.full((BATCH,), FRAMES, jnp.int32),
        "labels": jnp.asarray(
            rng.integers(1, VOCAB, (BATCH, 100)).astype(np.int32)),
        "label_lengths": jnp.full((BATCH,), 100, jnp.int32),
        "weight": jnp.ones((BATCH,), jnp.float32),
    }

    from cat_tpu.ops.crf_dense import dense_den_log_partition
    from cat_tpu.ops.specaug import specaug

    def make_step(variant):
        def loss_fn(params, batch_stats, batch, rng):
            feats = batch["feats"]
            if SPECAUG:
                feats = specaug(rng, feats, batch["feat_lengths"],
                                num_freq_masks=2, freq_mask_width=27,
                                num_time_masks=2, time_mask_width=100)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables, feats, batch["feat_lengths"],
                deterministic=False,
                mutable=["batch_stats"] if batch_stats else False,
                rngs={"dropout": rng})
            (logits, out_lens) = out[0] if batch_stats else out
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            if variant == "enc":
                return jnp.mean(lp)
            nll = ctc_loss(lp, batch["labels"], out_lens,
                           batch["label_lengths"], reduction="none")
            if variant == "ctc":
                return jnp.mean(nll)
            logz = dense_den_log_partition(lp, out_lens, den)
            return jnp.mean(logz + 1.1 * nll)

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, state.batch_stats, batch, rng)
            opt_state = set_lr(state.opt_state, 1e-4)
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1), loss

        return step

    for variant in ["enc", "ctc", "crf"]:
        if ONLY and variant != ONLY:
            continue
        step = make_step(variant)
        st = state
        key = jax.random.PRNGKey(0)
        t_c0 = time.time()
        st, loss = step(st, batch, key)
        float(loss)
        compile_s = time.time() - t_c0
        st, loss = step(st, batch, key)
        float(loss)
        trace_dir = os.environ.get("BENCH_TRACE", "")
        import contextlib
        ctx = (jax.profiler.trace(trace_dir + "_" + variant)
               if trace_dir else contextlib.nullcontext())
        t0 = time.time()
        with ctx:
            for i in range(STEPS):
                key, sub = jax.random.split(key)
                st, loss = step(st, batch, sub)
            float(loss)
        dt = (time.time() - t0) / STEPS
        print(json.dumps({"variant": variant,
                          "step_ms": round(dt * 1000, 1),
                          "audio_s_per_s": round(
                              BATCH * FRAMES * 0.01 / dt, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        # re-init state for the next variant (donated buffers are gone)
        state = init_state(model, tx, feat_dim=80)


if __name__ == "__main__":
    main()
