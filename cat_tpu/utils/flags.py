"""Performance-feature flags: config keys with env override.

Round-1 exposed the fused kernels only through environment variables
(CAT_TPU_FUSED_DROPOUT, CAT_TPU_FLASH_ATTN, CAT_TPU_{CTC,RNNT}_IMPL) —
invisible to the two-JSON config system the rest of the toolkit is built
on. Here they are proper config keys (config.json "perf": {...}, applied
by the pipeline via set_flags) with the env vars kept as overrides for
ad-hoc experiments, and validated kernels default ON on TPU ("auto").

Resolution order: env var CAT_TPU_<NAME> > set_flags() value > default.
"""
from __future__ import annotations

import os

_FLAGS: dict = {}

# validated defaults: "auto" resolves per-backend at use time
_DEFAULTS = {
    "fused_dropout": "auto",   # auto: Pallas kernel on TPU, flax off-TPU
    "flash_attn": "auto",      # auto: fused rel-pos attention on TPU
    # shear-free rel-pos decomposition inside the flash kernel (trig
    # tables + one MXU matmul instead of lane-roll shears)
    "flash_attn_decomp": "auto",
    # packed-layout decomp kernel: q/k/v in projection layout
    # (N, T, H*Dh), heads looped in-kernel — no transposes around the
    # kernel
    "flash_attn_packed": "auto",
    # pad the encoder's post-subsampling time dim to a multiple of 8 so
    # the attention kernels' row padding is a no-op
    "pad_time8": "auto",
    # chunked projected-table rel-pos scores inside the packed kernel
    # (minimal Dh-rank bd/du instead of the D-wide decomp matmuls);
    # requires flash_attn_packed
    "flash_attn_band": "",
    # round-2 on-chip A/B (bench shapes): pallas CTC grad 5.8 ms vs
    # scan 9.1 ms; pallas RNN-T grad 9.1 vs 9.6 — default on for TPU
    "ctc_impl": "auto",        # auto: pallas on TPU, XLA scan elsewhere
    "rnnt_impl": "auto",
    # fused conformer FF module (LN+matmuls+SiLU+dropouts+residual in
    # one Pallas pass each way, ops/ffn_pallas.py)
    "fused_ffn": "auto",
    # fused conv-module entry/exit stages around the XLA depthwise conv
    # + batch stats (ops/conv_module_pallas.py)
    "fused_conv_mod": "auto",
    # fused dense-den forward (whole alpha recursion in VMEM,
    # ops/crf_dense_pallas.py); backward stays in XLA. Off until the
    # on-chip A/B lands; single-chip only (no partitioning rules).
    "fused_den": "",
    # route fused ops through their custom_partitioning wrappers:
    # "" = auto (ambient mesh if any, else device_count>1), "0"/"1"
    # force off/on (ops/partitioning.py use_partitioned)
    "partitioned": "",
}


def set_flags(**kw):
    """Install config-provided flag values (pipeline "perf" section)."""
    for k, v in kw.items():
        _FLAGS[k] = str(v)


def reset_flags():
    _FLAGS.clear()


def flag(name: str) -> str:
    env = os.environ.get("CAT_TPU_" + name.upper())
    if env is not None:
        return env
    if name in _FLAGS:
        return _FLAGS[name]
    return _DEFAULTS.get(name, "")


def on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def resolve(name: str) -> str:
    """Flag value with "auto" resolved for the current backend."""
    v = flag(name)
    if v == "auto":
        return "1" if on_tpu() else ""
    return v
