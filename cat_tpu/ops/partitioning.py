"""Row-sharding custom_partitioning helper for the fused Pallas ops.

GSPMD cannot partition an opaque pallas_call — without a rule it
all-gathers the sharded activations around the kernel. Every fused op
in this package is embarrassingly parallel over its leading (row or
batch) dimension, with weights replicated; this helper declares exactly
that, plus a psum over the row axis for replicated weight-grad outputs
(which are partial sums per shard).

Used by ops/ffn_pallas.py (inline), ops/conv_module_pallas.py and
ops/attention_pallas.py (via make_row_partitioned).
"""
from __future__ import annotations

import jax


def _row_spec(sharding, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        spec = sharding.spec
    except AttributeError:
        return NamedSharding(mesh, P())
    row = spec[0] if len(spec) > 0 else None
    ndim = None
    return NamedSharding(mesh, P(row))


def _like_rank(xs, rank, mesh):
    """Row sharding expanded to `rank` dims (dim 0 sharded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    row = xs.spec[0] if len(xs.spec) else None
    return NamedSharding(mesh, P(row, *([None] * (rank - 1))))


def _repl(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def _shard_index(axes):
    """Flat index of this shard over the given mesh axes."""
    idx = None
    for ax in axes:
        i = jax.lax.axis_index(ax)
        idx = i if idx is None else idx * jax.lax.psum(1, ax) + i
    return idx


def offset_seed(seed, axes):
    """Decorrelate a per-shard PRNG seed: fold the shard index into
    seed[0] so data-parallel shards draw independent dropout masks
    (with a replicated seed every shard would reuse the same tile
    streams — statistically benign but avoidable)."""
    if not axes:
        return seed
    return seed.at[0].add(_shard_index(axes))


def make_row_partitioned(fn, *, static_argnums, row_args, out_specs,
                         rule, seed_arg=None):
    """Wrap `fn` (statics trailing) with a dim-0 row-sharding rule.

    row_args: indices of array args sharded on dim 0 (first = reference)
    out_specs: per-output 'row' | 'psum' ('psum' = replicated output
        that each shard computes as a partial sum over its rows)
    rule: sdy sharding-rule string for the shardy partitioner
    seed_arg: index of a replicated PRNG-seed arg to decorrelate per
        shard (see offset_seed)
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    cp = custom_partitioning(fn, static_argnums=static_argnums)
    ns = len(static_argnums)
    ref = row_args[0]

    def outs_sh(xs, mesh, result_shape):
        single = not isinstance(result_shape, (tuple, list))
        shapes = [result_shape] if single else list(result_shape)
        out = [(_like_rank(xs, len(s.shape), mesh)
                if k == "row" else _repl(mesh))
               for k, s in zip(out_specs, shapes)]
        return out[0] if single else tuple(out)

    def infer(*a):
        mesh, arg_shapes, result_shape = a[ns], a[ns + 1], a[ns + 2]
        xs = _row_spec(arg_shapes[ref].sharding, mesh)
        return outs_sh(xs, mesh, result_shape)

    def partition(*a):
        statics = a[:ns]
        mesh, arg_shapes, result_shape = a[ns], a[ns + 1], a[ns + 2]
        xs = _row_spec(arg_shapes[ref].sharding, mesh)
        arg_sh = tuple(
            (_like_rank(xs, len(arg_shapes[i].shape), mesh)
             if i in row_args else _repl(mesh))
            for i in range(len(arg_shapes)))
        out_sh = outs_sh(xs, mesh, result_shape)
        axes = tuple(ax for ax in (xs.spec[0] if len(xs.spec) else
                                   None,) if ax is not None)

        def lower(*args):
            if axes and seed_arg is not None:
                args = list(args)
                args[seed_arg] = offset_seed(args[seed_arg], axes)
            outs = fn(*args, *statics)
            if axes:
                if isinstance(outs, (tuple, list)):
                    outs = tuple(
                        jax.lax.psum(o, axes) if k == "psum" else o
                        for o, k in zip(outs, out_specs))
                elif out_specs[0] == "psum":
                    outs = jax.lax.psum(outs, axes)
            return outs

        return mesh, lower, out_sh, arg_sh

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


def use_partitioned():
    """Route fused ops through their custom_partitioning wrappers.

    Explicit override via the "partitioned" flag (CAT_TPU_PARTITIONED
    0/1); otherwise prefer the ambient abstract mesh when one is active
    (jax.sharding.use_mesh / shard_map contexts), falling back to the
    global device count. The wrappers are semantically identical either
    way — this only decides whether GSPMD sees a sharding rule or an
    opaque single-device call."""
    from cat_tpu.utils.flags import flag
    v = flag("partitioned")
    if v in ("0", "1"):
        return v == "1"
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and getattr(m, "size", 0) > 0:
            if not getattr(m, "empty", False):
                return m.size > 1
    except Exception:
        pass
    return jax.device_count() > 1
