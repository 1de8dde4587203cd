"""Capture a device trace of a callable and print per-op device time.

Usage: python tools/trace_ops.py attn   # raw decomp attention fwd+bwd
       python tools/trace_ops.py step   # full flagship train step
Parses the xplane with xprof's raw proto reader and aggregates
TensorCore op durations by name.
"""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def parse_xplane(logdir, topk=40):
    files = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb"))
    assert files, f"no xplane under {logdir}"
    path = files[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name or "non-core" in plane.name.lower():
            continue
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            lname = line.name.lower()
            if "xla op" in lname or "tensorflow op" in lname:
                continue
            if lname not in ("xla modules",) and "step" not in lname:
                pass
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                tot[(line.name, meta.name)] += ev.duration_ps / 1e9
                cnt[(line.name, meta.name)] += 1
        print(f"== plane: {plane.name}")
        byline = defaultdict(float)
        for (ln, name), ms in tot.items():
            byline[ln] += ms
        for ln, ms in sorted(byline.items(), key=lambda x: -x[1]):
            print(f"  line {ln}: {ms:.2f} ms total")
        items = sorted(tot.items(), key=lambda x: -x[1])[:topk]
        for (ln, name), ms in items:
            print(f"  {ms:8.3f} ms  x{cnt[(ln, name)]:4d}  [{ln}] "
                  f"{name[:90]}")


def parse_grouped(logdir, divide_by=1):
    """Aggregate TensorCore op time into coarse groups (lever table)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    assert files, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())

    def group_of(name):
        n = name.lower()
        if "pallas_call" in n or "custom-call" in n:
            return "pallas kernels (attn+ffn+conv_mod+dropout)"
        if "convolution" in n or "conv" in n and "fusion" in n:
            return "convolutions"
        if "dot" in n or "dot_general" in n:
            return "matmul"
        if "dynamic-update-slice" in n or "dynamic_update" in n:
            return "dynamic-update-slice (residual stacks)"
        if "copy" in n or "bitcast" in n or "transpose" in n:
            return "copies/transposes"
        if "reduce" in n:
            return "reduces"
        if "fusion" in n:
            return "loop fusions (elementwise)"
        if "pad" in n or "slice" in n:
            return "pad/slice"
        return "other"

    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        tot = defaultdict(float)
        cnt = defaultdict(int)
        ops = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = plane.event_metadata[ev.metadata_id].name
                g = group_of(m)
                tot[g] += ev.duration_ps / 1e9
                cnt[g] += 1
                ops[(g, m.split(" = ")[0])] += ev.duration_ps / 1e9
        total = sum(tot.values())
        print(f"device-busy total: {total/divide_by:.1f} ms/step")
        for g, ms in sorted(tot.items(), key=lambda x: -x[1]):
            print(f"  {ms/divide_by:8.1f} ms  {100*ms/total:5.1f}%  "
                  f"{g}  (x{cnt[g]})")
        print("top ops:")
        for (g, m), ms in sorted(ops.items(), key=lambda x: -x[1])[:25]:
            print(f"  {ms/divide_by:8.2f} ms  [{g[:28]}] {m[:70]}")


def trace_attn():
    from cat_tpu.ops import attention_pallas as ap
    N, T, H, Dh, D = 128, 400, 8, 64, 512
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    k = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    v = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    w = jnp.asarray(rng.standard_normal((H, Dh, D)) * 0.2, dt)
    ub = jnp.asarray(rng.standard_normal((H, 1, Dh)) * 0.1, dt)
    vb = jnp.asarray(rng.standard_normal((H, 1, Dh)) * 0.1, dt)
    kb = jnp.zeros((N, 1, T), jnp.float32)
    seed = jnp.asarray([1, 2], jnp.int32)
    tabs = tuple(jnp.asarray(x).astype(dt)
                 for x in ap._decomp_tables(T, D))
    rate = float(os.environ.get("AB_RATE", "0.1"))
    lse = jnp.zeros((N, H, 1, T), jnp.float32)
    do = jnp.asarray(rng.standard_normal((N, H, T, Dh)), dt)
    dd = jnp.zeros((N, H, 1, T), jnp.float32)

    @jax.jit
    def f(q, k, v, w, i):
        o, _ = ap._pallas_fwd_decomp(q + i.astype(dt), k, v, w, tabs,
                                     kb, ub, vb, seed, 0.125, rate,
                                     False)
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def g(q, k, v, w, i):
        outs = ap._pallas_bwd_decomp(q + i.astype(dt), k, v, w, tabs,
                                     kb, ub, vb, seed, lse, do, dd,
                                     0.125, rate, False)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in outs)

    r = f(q, k, v, w, jnp.float32(0))
    r2 = g(q, k, v, w, jnp.float32(0))
    jax.block_until_ready((r, r2))
    logdir = "/tmp/attn_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        rs = []
        for j in range(5):
            rs.append(f(q, k, v, w, jnp.float32(j)))
            rs.append(g(q, k, v, w, jnp.float32(j)))
        jax.block_until_ready(rs)
    print("note: 5 fwd + 5 bwd calls captured; divide totals by 5")
    parse_xplane(logdir)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "attn"
    if what == "attn":
        trace_attn()
    elif what == "grouped":
        parse_grouped(sys.argv[2],
                      divide_by=int(sys.argv[3])
                      if len(sys.argv) > 3 else 1)
