"""CUSIDE unified (streaming + non-streaming) CTC task module.

Counterpart of /root/reference/cat/ctc/train_unified.py (UnifiedAMTrainer)
as a pipeline-drivable task: build_model / init_state / make_train_step /
make_eval_step with the same signatures as cat_tpu.ctc.train, so
hyper-p.json can point "train.bin" at cat_tpu.ctc.train_unified.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from cat_tpu import models
from cat_tpu.ctc.streaming import (SimuNet, UnifiedEncoder,
                                   make_unified_loss_fn)
from cat_tpu.utils.manager import TrainState


def build_model(cfg: dict, num_classes: int) -> UnifiedEncoder:
    enc_cfg = cfg["encoder"]
    kw = dict(enc_cfg.get("kwargs", {}))
    kw["num_classes"] = num_classes
    encoder = models.get_encoder(enc_cfg["type"])(**kw)
    ucfg = cfg.get("unified", {})
    chunk = ucfg.get("chunk", 64)
    right = ucfg.get("right_context", 16)
    simu = SimuNet(feat_dim=ucfg.get("feat_dim", 80),
                   hidden=ucfg.get("simu_hidden", 256), right=right)
    return UnifiedEncoder(encoder=encoder, simu=simu, chunk=chunk,
                          left=ucfg.get("left_context", chunk),
                          right=right)


def init_state(model, tx, feat_dim: int, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    feats = jnp.zeros((2, 4 * model.chunk, feat_dim), jnp.float32)
    lens = jnp.asarray([4 * model.chunk] * 2, jnp.int32)
    k1, k2 = jax.random.split(rng)
    v_full = jax.jit(lambda k: model.init(
        k, feats, lens, method=model.full_forward))(k1)
    v_chunk = jax.jit(lambda k: model.init(
        k, feats, lens, method=model.chunk_forward))(k2)
    # chunk init superset includes the simu net; merge params
    params = dict(v_chunk["params"])
    for k, v in v_full["params"].items():
        params.setdefault(k, v)
    batch_stats = v_chunk.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.asarray(0))


def make_train_step(model, tx, loss_type="ctc", den=None, lamb=0.1,
                    specaug_cfg=None, grad_clip=5.0, lamb_chunk=0.5,
                    lamb_simu=1.0, future="simu", grad_accum_fold=1):
    from cat_tpu.ctc.train import _make_accum_train_step, set_lr
    from cat_tpu.ops.specaug import specaug

    loss_fn = make_unified_loss_fn(model, lamb_chunk, lamb_simu, future)

    if grad_accum_fold > 1:
        # adapt to the (loss, (stats, per_seq)) interface: the unified
        # loss is a per-batch weighted mean, so broadcasting it as
        # per_seq makes the fold wrapper's sum/weight bookkeeping exact
        def fold_loss(params, batch_stats, batch, rng, train):
            k_aug, k_loss = jax.random.split(rng)
            if train and specaug_cfg is not None:
                feats = specaug(k_aug, batch["feats"],
                                batch["feat_lengths"], **specaug_cfg)
                batch = dict(batch, feats=feats)
            loss, (stats, _, _, _) = loss_fn(
                params, batch_stats, batch, k_loss, train)
            per_seq = jnp.broadcast_to(loss, batch["weight"].shape)
            return loss, (stats, per_seq)

        return _make_accum_train_step(fold_loss, tx, grad_clip,
                                      grad_accum_fold)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        k_aug, k_loss = jax.random.split(rng)
        if specaug_cfg is not None:
            feats = specaug(k_aug, batch["feats"],
                            batch["feat_lengths"], **specaug_cfg)
            batch = dict(batch, feats=feats)
        (loss, (stats, lf, lc, l1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, k_loss, True)
        gnorm = optax.global_norm(grads)
        if grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=stats,
                              opt_state=opt_state, step=state.step + 1),
                {"loss": loss, "loss_full": lf, "loss_chunk": lc,
                 "loss_simu": l1, "grad_norm": gnorm})

    return train_step


def make_eval_step(model, loss_type="ctc", den=None, lamb=0.1,
                   future="simu"):
    loss_fn = make_unified_loss_fn(model, 0.5, 0.0, future)

    @jax.jit
    def eval_step(state: TrainState, batch):
        loss, (_, lf, lc, _) = loss_fn(state.params, state.batch_stats,
                                       batch, jax.random.PRNGKey(0),
                                       False)
        w = batch["weight"]
        cnt = jnp.sum(w)
        # metric: joint loss scaled back to per-sequence sums
        return {"loss_sum": loss * cnt, "count": cnt}

    return eval_step
