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
    from xprof.convert import raw_to_tool_data as rtd
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
