"""Measure the cost of a WER-scheduled eval pass at the flagship shape
(VERDICT r2 weak #8 / r4 weak #6): conformer 17×512, V=72, batch
128×1600 frames — deterministic encoder forward + on-device batched
prefix beam (`ctc_beam_search_device`, the eval path
pipeline/asr.py _make_eval_metric uses) + host-side transcript
assembly.

Prints per-batch ms for (a) fwd only, (b) fwd+beam, and audio-s/s, so
the per-N-step WER eval recommendation in STATUS can carry a number.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        os.environ.setdefault("CAT_TPU_FUSED_DROPOUT", "1")
        os.environ.setdefault("CAT_TPU_FLASH_ATTN", "1")

    from cat_tpu.ctc.decode_jax import ctc_beam_search_device
    from cat_tpu.ctc.train import build_model, init_state
    from cat_tpu.utils.scheduler import build_scheduler

    B = int(os.environ.get("EVAL_BATCH", "128"))
    T = int(os.environ.get("EVAL_FRAMES", "1600"))
    V = 72
    beam = int(os.environ.get("EVAL_BEAM", "4"))
    model = build_model(
        {"encoder": {"type": "ConformerNet",
                     "kwargs": {"num_cells": 17, "hdim": 512,
                                "num_heads": 8, "kernel_size": 32,
                                "dropout_rate": 0.1}}},
        num_classes=V)
    _, tx = build_scheduler({
        "type": "SchedulerNoam",
        "kwargs": {"dim_model": 512, "warmup_step": 100,
                   "stop_step": 1000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = init_state(model, tx, feat_dim=80)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def fwd(variables, feats, flens):
        logits, olens = model.apply(variables, feats, flens,
                                    deterministic=True)
        return jax.nn.log_softmax(logits.astype(jnp.float32)), olens

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    flens = jnp.full((B,), T, jnp.int32)

    def timed(fn, n=3):
        fn()  # warmup/compile
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # (a) forward only — float() forces a real sync on this backend
    t_fwd = timed(lambda: float(fwd(variables, feats, flens)[0][0, 0, 0]))

    # (b) forward + on-device beam + host transcript assembly (what
    # _make_eval_metric does per batch)
    def eval_pass():
        lp, olens = fwd(variables, feats, flens)
        prefixes, plens, _ = ctc_beam_search_device(
            lp, olens, beam_width=beam, max_len=64)
        prefixes = np.asarray(prefixes)
        plens = np.asarray(plens)
        return [list(prefixes[n, 0, : plens[n, 0]])
                for n in range(B)]

    t_eval = timed(eval_pass)
    audio_s = B * T / 100.0
    print(f"batch {B} x {T} frames = {audio_s:.0f} audio-s, beam {beam}")
    print(f"fwd only       : {t_fwd * 1e3:8.1f} ms/batch "
          f"({audio_s / t_fwd:7.0f} audio-s/s)")
    print(f"fwd+beam+host  : {t_eval * 1e3:8.1f} ms/batch "
          f"({audio_s / t_eval:7.0f} audio-s/s)")
    print(f"beam overhead  : {(t_eval - t_fwd) * 1e3:8.1f} ms/batch")


if __name__ == "__main__":
    main()
