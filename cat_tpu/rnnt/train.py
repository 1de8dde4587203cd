"""RNN-T trainer assembly.

Counterpart of /root/reference/cat/rnnt/train.py: TransducerTrainer
(:112-223 — encoder + predictor + joiner + warp_rnnt loss, compact
layout, predictor-output masking), build_model (:240-353).

TPU design: one flax module bundles encoder/predictor/joiner; the loss is
the native scan-based rnnt_loss (cat_tpu.ops.rnnt) on the dense
(N, T, U+1, V) log-prob lattice — only materialized inside jit where XLA
fuses the joiner broadcast-add into it. The compact-layout CUDA gather
ops (gather.cat/sum) have no equivalent here by design.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from cat_tpu import models
from cat_tpu.models import joiner as joiner_zoo
from cat_tpu.ops.rnnt import rnnt_loss
from cat_tpu.ops.rnnt_simple import rnnt_loss_simple
from cat_tpu.ops.specaug import specaug
from cat_tpu.utils.manager import TrainState


class TransducerModel(nn.Module):
    """Encoder + predictor + joiner; blank = 0 = <bos>.

    predictor_mask (cat/rnnt/train.py:203-204): SpecAug-style time
    masking of the predictor output during training — num_predictor_mask
    masks whose width is capped at predictor_mask_range (a fraction of
    the label length when < 1, an absolute width otherwise)."""

    encoder: nn.Module
    predictor: nn.Module
    joiner: nn.Module
    predictor_mask_range: float = 0.1
    num_predictor_mask: int = -1

    def __call__(self, feats, flens, labels, llens, deterministic=True):
        enc, olens = self.encoder(feats, flens,
                                  deterministic=deterministic)
        N = labels.shape[0]
        bos = jnp.zeros((N, 1), jnp.int32)
        pred_in = jnp.concatenate([bos, labels.astype(jnp.int32)], axis=1)
        pred, _ = self.predictor(pred_in, llens + 1,
                                 deterministic=deterministic)
        if not deterministic and self.num_predictor_mask > 0:
            from cat_tpu.ops.specaug import _mask_time_adaptive

            if self.predictor_mask_range < 1:
                cap, ratio = pred.shape[1], self.predictor_mask_range
            else:
                cap, ratio = int(self.predictor_mask_range), 1.0
            pred = _mask_time_adaptive(
                self.make_rng("pred_mask"), pred, llens + 1,
                self.num_predictor_mask, cap, ratio)
        logits = self.joiner(enc, pred)  # (N,T,U+1,V) or (f, g) tuple
        return logits, olens

    def encode(self, feats, flens, deterministic=True):
        return self.encoder(feats, flens, deterministic=deterministic)

    def predict(self, tokens, lengths=None, deterministic=True):
        return self.predictor(tokens, lengths,
                              deterministic=deterministic)

    def join(self, enc, pred):
        return self.joiner(enc, pred)

    def predict_step(self, tokens, state):
        """Incremental predictor step for decoding."""
        return self.predictor.step(tokens, state)


def build_model(cfg: dict, num_classes: int) -> TransducerModel:
    """cfg: {"encoder": {...}, "decoder"/"predictor": {...},
    "joiner": {...}, "trainer": {...}} — type/kwargs reflection like the
    reference (cat/rnnt/train.py:240-353)."""
    enc_cfg = cfg["encoder"]
    enc_kw = dict(enc_cfg.get("kwargs", {}))
    enc_kw["with_head"] = False
    enc_kw.pop("num_classes", None)
    encoder = models.get_encoder(enc_cfg["type"])(**enc_kw)

    pred_cfg = cfg.get("predictor", cfg.get("decoder"))
    pred_kw = dict(pred_cfg.get("kwargs", {}))
    pred_kw.setdefault("vocab_size", num_classes)
    pred_kw["with_head"] = False
    predictor = models.get_decoder(pred_cfg["type"])(**pred_kw)

    join_cfg = cfg["joiner"]
    join_kw = dict(join_cfg.get("kwargs", {}))
    join_kw["odim"] = num_classes
    joiner = models.get_joiner(join_cfg["type"])(**join_kw)
    trainer_cfg = cfg.get("trainer", {})
    return TransducerModel(
        encoder=encoder, predictor=predictor, joiner=joiner,
        predictor_mask_range=trainer_cfg.get("predictor_mask_range", 0.1),
        num_predictor_mask=trainer_cfg.get("num_predictor_mask", -1))


def _append_eos(labels, llens, eos_id: int):
    """Append <eos> after the last label (cat/rnnt/train.py:112-223
    eos_id option): pad one column and scatter eos at position llens."""
    N = labels.shape[0]
    labels = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)], axis=1)
    pos = jnp.arange(labels.shape[1])[None, :]
    labels = jnp.where(pos == llens[:, None], eos_id, labels)
    return labels, llens + 1


def init_state(model, tx, feat_dim: int, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    feats = jnp.zeros((2, 16, feat_dim), jnp.float32)
    flens = jnp.asarray([16, 16], jnp.int32)
    labels = jnp.zeros((2, 4), jnp.int32)
    llens = jnp.asarray([4, 4], jnp.int32)
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, feats, flens, labels, llens)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.asarray(0))


def make_loss_fn(model, specaug_cfg: Optional[dict] = None,
                 joiner_normalized: bool = False, topo: str = "rnnt",
                 eos_id: int = -1):
    """joiner_normalized: True for HAT (already log-probs).
    topo: 'rnnt' (standard) or 'rna'/'ctct' (monotonic, every emission
    consumes a frame — cat/rnnt/train.py:210 topo option).
    eos_id: append <eos> to targets when >= 0 (cat/rnnt/train.py eos_id).

    A LogAdd joiner (models.joiner.LogAdd) is dispatched automatically
    to the fused simple loss (ops.rnnt_simple / ops.rnnt_rna simple) —
    the (N,T,U,V) lattice is never materialized, matching the
    reference's warp_rnnt.rnnt_loss_simple path
    (cat/rnnt/train.py:206-213)."""
    is_simple = isinstance(model.joiner, joiner_zoo.LogAdd)

    def loss_fn(params, batch_stats, batch, rng, train):
        feats = batch["feats"]
        flens = batch["feat_lengths"]
        k_aug, k_drop, k_mask = jax.random.split(rng, 3)
        if train and specaug_cfg is not None:
            feats = specaug(k_aug, feats, flens, **specaug_cfg)
        labels = batch["labels"]
        llens = batch["label_lengths"]
        if eos_id >= 0:
            labels, llens = _append_eos(labels, llens, eos_id)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        rngs = {"dropout": k_drop, "pred_mask": k_mask} if train else {}
        out = model.apply(variables, feats, flens, labels, llens,
                          deterministic=not train, mutable=mutable,
                          rngs=rngs)
        if mutable:
            (logits, olens), new_vars = out
            new_stats = new_vars.get("batch_stats", batch_stats)
        else:
            logits, olens = out
            new_stats = batch_stats
        if is_simple:
            f, g = logits
            per_seq = rnnt_loss_simple(
                f.astype(jnp.float32), g.astype(jnp.float32), labels,
                olens, llens, reduction="none")
        else:
            lp = logits.astype(jnp.float32)
            if not joiner_normalized:
                lp = jax.nn.log_softmax(lp, axis=-1)
            if topo in ("rna", "ctct"):
                from cat_tpu.ops.rnnt_rna import rnnt_loss_rna

                per_seq = rnnt_loss_rna(lp, labels, olens, llens,
                                        reduction="none")
            else:
                per_seq = rnnt_loss(lp, labels, olens, llens,
                                    reduction="none")
        w = batch["weight"]
        loss = jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, (new_stats, per_seq)

    return loss_fn


def make_train_step(model, tx, specaug_cfg=None, grad_clip=5.0,
                    joiner_normalized=False, topo="rnnt", eos_id=-1,
                    grad_accum_fold=1):
    from cat_tpu.ctc.train import (_make_accum_train_step, _tree_where,
                                   set_lr)

    loss_fn = make_loss_fn(model, specaug_cfg, joiner_normalized, topo,
                           eos_id)
    if grad_accum_fold > 1:
        return _make_accum_train_step(loss_fn, tx, grad_clip,
                                      grad_accum_fold)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (new_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng, True)
        gnorm = optax.global_norm(grads)
        # NaN/Inf skip-update guard (manager_wo.py:613-641 role)
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
        return (state.replace(
                    params=_tree_where(finite, params, state.params),
                    batch_stats=_tree_where(finite, new_stats,
                                            state.batch_stats),
                    opt_state=_tree_where(finite, opt_state, opt_state0),
                    step=state.step + 1),
                {"loss": loss, "grad_norm": gnorm,
                 "skipped": (~finite).astype(jnp.int32)})

    return train_step


def make_eval_step(model, joiner_normalized=False, topo="rnnt",
                   eos_id=-1):
    loss_fn = make_loss_fn(model, None, joiner_normalized, topo, eos_id)

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (_, per_seq) = loss_fn(state.params, state.batch_stats, batch,
                                  jax.random.PRNGKey(0), False)
        w = batch["weight"]
        return {"loss_sum": jnp.sum(per_seq * w), "count": jnp.sum(w)}

    return eval_step
