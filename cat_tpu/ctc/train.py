"""CTC / CTC-CRF trainer assembly.

Counterpart of /root/reference/cat/ctc/train.py: AMTrainer (:101-197 —
CTC or CTC-CRF loss with lazy den-LM context), build_model (:284-365 —
encoder from config + syncBN + DDP wrap), main_worker (:45-99).

TPU design: build_model returns a flax encoder; make_train_step returns
ONE jitted SPMD step — specaug → encoder → log_softmax → loss → grads →
optax update — with gradients/batch-stats reduced across the 'data' mesh
axis by GSPMD (no DDP wrapper, no CPU label staging: labels stay on
device, unlike train.py:176-178).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cat_tpu import models
from cat_tpu.ops.crf import DenDevice, den_log_partition
from cat_tpu.ops.crf_dense import DenseDen, dense_den_log_partition
from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.ops.specaug import specaug
from cat_tpu.utils.manager import TrainState


def build_model(cfg: dict, num_classes: int):
    """cfg: {"encoder": {"type": ..., "kwargs": {...}}}. Vocab size is
    injected (the recursive_rpl equivalent, common_utils.py:436-446)."""
    enc_cfg = cfg["encoder"]
    kwargs = dict(enc_cfg.get("kwargs", {}))
    kwargs["num_classes"] = num_classes
    cls = models.get_encoder(enc_cfg["type"])
    return cls(**kwargs)


def init_state(model, tx, feat_dim: int, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, feat_dim), jnp.float32)
    lens = jnp.asarray([16, 16], jnp.int32)
    # jit the init: eager dispatch is pathologically slow on some
    # platforms, and init is pure.
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, x, lens)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.asarray(0))


def set_lr(opt_state, lr):
    """Recursively set the injected learning_rate hyperparameter."""
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = lr
        return opt_state._replace(hyperparams=hp)
    if hasattr(opt_state, "_replace") and hasattr(opt_state, "_fields"):
        return opt_state._replace(**{
            f: set_lr(getattr(opt_state, f), lr)
            for f in opt_state._fields
            if _contains_hyperparams(getattr(opt_state, f))})
    if isinstance(opt_state, tuple):
        return tuple(set_lr(s, lr) if _contains_hyperparams(s) else s
                     for s in opt_state)
    return opt_state


def _contains_hyperparams(x):
    if hasattr(x, "hyperparams"):
        return True
    if hasattr(x, "_fields"):
        return any(_contains_hyperparams(getattr(x, f)) for f in x._fields)
    if isinstance(x, tuple):
        return any(_contains_hyperparams(s) for s in x)
    return False


def _weighted_mean(per_seq, weight):
    return jnp.sum(per_seq * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def _tree_where(pred, new, old):
    """Elementwise select over two matching pytrees (non-array leaves —
    e.g. optax count schedules' ints or hyperparam dicts — pass through
    from `new`)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred, n, o) if hasattr(n, "shape") else n,
        new, old)


def make_loss_fn(model, loss_type="ctc", den: Optional[DenDevice] = None,
                 lamb: float = 0.1, specaug_cfg: Optional[dict] = None):
    """Returns loss(params, batch_stats, batch, rng, train) →
    (loss, (batch_stats, per_seq_nll))."""

    def loss_fn(params, batch_stats, batch, rng, train):
        feats = batch["feats"]
        flens = batch["feat_lengths"]
        k_aug, k_drop = jax.random.split(rng)
        if train and specaug_cfg is not None:
            feats = specaug(k_aug, feats, flens, **specaug_cfg)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        out = model.apply(variables, feats, flens,
                          deterministic=not train, mutable=mutable,
                          rngs={"dropout": k_drop} if train else {})
        if mutable:
            (logits, out_lens), new_vars = out
            new_stats = new_vars.get("batch_stats", batch_stats)
        else:
            logits, out_lens = out
            new_stats = batch_stats
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        labels = batch["labels"]
        llens = batch["label_lengths"]
        if loss_type == "ctc":
            per_seq = ctc_loss(lp, labels, out_lens, llens,
                               reduction="none")
        elif loss_type == "crf":
            # cost = den_lld − (1+λ)·ctc_lld (ctc_crf/__init__.py:81-83)
            nll = ctc_loss(lp, labels, out_lens, llens, reduction="none")
            if isinstance(den, DenseDen):
                logz = dense_den_log_partition(lp, out_lens, den)
            else:
                logz = den_log_partition(lp, out_lens, den)
            per_seq = logz + (1.0 + lamb) * nll
        else:
            raise ValueError(loss_type)
        loss = _weighted_mean(per_seq, batch["weight"])
        return loss, (new_stats, per_seq)

    return loss_fn


def make_train_step(model, tx, loss_type="ctc", den=None, lamb=0.1,
                    specaug_cfg=None, grad_clip=5.0, grad_accum_fold=1):
    """grad_accum_fold > 1 enables weight-aware gradient accumulation
    (manager.py:660-676 no_sync fold semantics): init_state must then be
    called with the SAME wrapped transform, see accum_tx()."""
    loss_fn = make_loss_fn(model, loss_type, den, lamb, specaug_cfg)

    if grad_accum_fold > 1:
        return _make_accum_train_step(loss_fn, tx, grad_clip,
                                      grad_accum_fold)

    # donate the input state: params/opt-state buffers are reused for
    # the output, halving peak HBM for the largest arrays
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (new_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng, True)
        gnorm = optax.global_norm(grads)
        # NaN/Inf skip-update guard (manager_wo.py:613-641 role): a
        # poisoned batch leaves params / opt_state / batch_stats
        # untouched and increments `skipped` instead of corrupting state
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        if grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            scale = jnp.where(finite, scale, 0.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        opt_state0 = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state0, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=_tree_where(finite, params, state.params),
            batch_stats=_tree_where(finite, new_stats, state.batch_stats),
            opt_state=_tree_where(finite, opt_state, opt_state0),
            step=state.step + 1)
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "skipped": (~finite).astype(jnp.int32)}

    return train_step


def accum_tx(tx, grad_accum_fold: int, grad_clip: float = 5.0):
    """Wrap an optax transform for fold-N accumulation; pass the result
    as `tx` to init_state so opt_state carries the accumulators."""
    from cat_tpu.utils.grad_accum import WeightedMultiSteps

    return WeightedMultiSteps(tx, grad_accum_fold, grad_clip)


def _make_accum_train_step(loss_fn, tx, grad_clip, fold):
    """Shared fold-N step builder: tx may be raw (wrapped here) or an
    already-wrapped WeightedMultiSteps."""
    from cat_tpu.utils.grad_accum import WeightedMultiSteps

    wrapped = tx if isinstance(tx, WeightedMultiSteps) \
        else WeightedMultiSteps(tx, fold, grad_clip)

    def sum_objective(params, batch_stats, batch, rng):
        # gradients of the weighted SUM; the wrapper divides by the
        # fold-total weight at the boundary -> exact global-mean grads
        _, (new_stats, per_seq) = loss_fn(params, batch_stats, batch,
                                          rng, True)
        w = batch["weight"]
        return jnp.sum(per_seq * w), (new_stats, jnp.sum(w))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss_sum, (new_stats, w_sum)), grads = jax.value_and_grad(
            sum_objective, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
        # NaN/Inf guard: a poisoned micro-batch contributes nothing to
        # the fold accumulator (weight 0) and keeps old batch_stats
        micro_gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(loss_sum) & jnp.isfinite(micro_gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        w_sum = jnp.where(finite, w_sum, 0.0)
        new_stats = _tree_where(finite, new_stats, state.batch_stats)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state, gnorm, applied = wrapped.update(
            grads, opt_state, state.params, w_sum)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state,
                                  step=state.step + 1)
        loss = jnp.where(finite, loss_sum, 0.0) / jnp.maximum(w_sum, 1.0)
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "applied": applied,
                           "skipped": (~finite).astype(jnp.int32)}

    return train_step


def make_eval_step(model, loss_type="ctc", den=None, lamb=0.1):
    loss_fn = make_loss_fn(model, loss_type, den, lamb, None)

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (_, per_seq) = loss_fn(state.params, state.batch_stats, batch,
                                  jax.random.PRNGKey(0), False)
        w = batch["weight"]
        return {"loss_sum": jnp.sum(per_seq * w), "count": jnp.sum(w)}

    return eval_step
