"""Weight-aware gradient accumulation (grad_accum_fold).

Counterpart of /root/reference/cat/shared/manager.py:660-676: the
reference folds N micro-batches per optimizer update by skipping the DDP
allreduce (`model.no_sync()`) on all but the fold-closing micro-batch,
with the loss rescaled by real sequence counts so uneven batches average
correctly (manager.py:482-505).

TPU design: no DDP, so accumulation is explicit state. The train step
computes gradients of the *weighted sum* of per-sequence losses and this
wrapper accumulates (grad_sum, weight_sum) pairs; at the fold boundary it
divides — grad of the global weighted mean over all fold x batch
sequences, exactly matching a single large batch — applies optional
global-norm clipping, and runs the inner optax transform. All control
flow is branch-free (masked selects) so one compiled step serves every
micro-step; accumulator state lives inside opt_state so checkpointing,
donation and `set_lr` recursion keep working unchanged.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class MultiStepsState(NamedTuple):
    inner: Any          # inner optax transform state
    acc: Any            # accumulated gradient SUMS (params-shaped)
    weight: jnp.ndarray  # accumulated total sequence weight, f32 scalar
    count: jnp.ndarray   # micro-steps since last apply, i32 scalar


class WeightedMultiSteps:
    """Wraps an optax GradientTransformation with fold-N weighted
    gradient accumulation.

    update() takes gradients of the weighted-SUM loss plus the batch's
    total weight, and returns (updates, new_state, grad_norm, applied):
    updates are zero except on fold-closing micro-steps.
    """

    def __init__(self, tx, fold: int, grad_clip: float = 0.0):
        self.tx = tx
        self.fold = int(fold)
        self.grad_clip = float(grad_clip)

    def init(self, params) -> MultiStepsState:
        return MultiStepsState(
            inner=self.tx.init(params),
            acc=jax.tree_util.tree_map(jnp.zeros_like, params),
            weight=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.int32))

    def update(self, grad_sums, state: MultiStepsState, params,
               weight):
        acc = jax.tree_util.tree_map(jnp.add, state.acc, grad_sums)
        w = state.weight + jnp.asarray(weight, jnp.float32)
        count = state.count + 1
        apply_now = count >= self.fold

        mean = jax.tree_util.tree_map(
            lambda a: a / jnp.maximum(w, 1e-8), acc)
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g))
            for g in jax.tree_util.tree_leaves(mean)))
        if self.grad_clip > 0:
            scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-6))
            mean = jax.tree_util.tree_map(lambda g: g * scale, mean)

        # Run the inner transform unconditionally (elementwise cost is
        # negligible next to fwd+bwd) and mask: jnp.where keeps a single
        # compiled program per bucket shape instead of lax.cond branches.
        cand_updates, cand_inner = self.tx.update(mean, state.inner,
                                                  params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(apply_now, u, jnp.zeros_like(u)),
            cand_updates)
        new_inner = jax.tree_util.tree_map(
            lambda new, old: jnp.where(apply_now, new, old)
            if hasattr(new, "shape") else new,
            cand_inner, state.inner)
        new_acc = jax.tree_util.tree_map(
            lambda a: jnp.where(apply_now, jnp.zeros_like(a), a), acc)
        new_state = MultiStepsState(
            inner=new_inner,
            acc=new_acc,
            weight=jnp.where(apply_now, 0.0, w),
            count=jnp.where(apply_now, 0, count))
        return updates, new_state, gnorm, apply_now
