"""Multichannel end-to-end (ME2E) CTC task: beamformer + AM jointly.

Counterpart of /root/reference/cat/ctc/train_me2e.py:105-247 (STFT →
neural MVDR beamform → fbank → encoder → CTC/CRF, trained end-to-end)
with the manager_wo-style NaN/Inf grad guard (manager_wo.py:613-641).

Batches carry raw multichannel waveforms: feats = (N, C, L) float32,
feat_lengths = sample counts.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from cat_tpu import models
from cat_tpu.front.beamformer import BeamformerNet
from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.ops.specaug import specaug
from cat_tpu.utils.manager import TrainState


class Me2eModel(nn.Module):
    frontend: BeamformerNet
    encoder: nn.Module

    def __call__(self, wave, wave_lengths, deterministic=True):
        feats, flens = self.frontend(wave, wave_lengths,
                                     deterministic=deterministic)
        return self.encoder(feats, flens, deterministic=deterministic)

    def features(self, wave, wave_lengths, deterministic=True):
        return self.frontend(wave, wave_lengths,
                             deterministic=deterministic)


def build_model(cfg: dict, num_classes: int) -> Me2eModel:
    f_kw = dict(cfg.get("frontend", {}).get("kwargs", {}))
    frontend = BeamformerNet(**f_kw)
    enc_cfg = cfg["encoder"]
    e_kw = dict(enc_cfg.get("kwargs", {}))
    e_kw["num_classes"] = num_classes
    encoder = models.get_encoder(enc_cfg["type"])(**e_kw)
    return Me2eModel(frontend=frontend, encoder=encoder)


def init_state(model, tx, num_channels=4, rng=None,
               num_samples=4000) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    wave = jnp.zeros((2, num_channels, num_samples), jnp.float32)
    lens = jnp.asarray([num_samples] * 2, jnp.int32)
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, wave, lens)
    return TrainState(params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]),
                      step=jnp.asarray(0))


def make_train_step(model, tx, grad_clip=5.0, specaug_cfg=None,
                    channels_last=False):
    """channels_last: batches carry wave as (N, L, C) (the packed-data
    layout, time-major for bucketing) — transposed to the model's
    (N, C, L) inside jit (free: XLA folds it into the STFT gather)."""
    from cat_tpu.ctc.train import set_lr

    def loss_fn(params, batch_stats, batch, rng, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        wave = batch["feats"]
        if channels_last:
            wave = jnp.swapaxes(wave, 1, 2)
        out = model.apply(variables, wave,
                          batch["feat_lengths"],
                          deterministic=not train, mutable=mutable,
                          rngs={"dropout": rng} if train else {})
        if mutable:
            (logits, olens), nv = out
            stats = nv.get("batch_stats", batch_stats)
        else:
            logits, olens = out
            stats = batch_stats
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        per_seq = ctc_loss(lp, batch["labels"], olens,
                           batch["label_lengths"], reduction="none")
        w = batch["weight"]
        loss = jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, (stats, per_seq)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng, True)
        # NaN/Inf grad guard (manager_wo.py:635-638): skip the update
        # when any gradient is non-finite (complex-domain MVDR can
        # produce spikes early in training)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        scale = jnp.where(finite,
                          jnp.minimum(1.0, grad_clip / (gnorm + 1e-6)),
                          0.0)
        grads = jax.tree_util.tree_map(lambda g: jnp.where(
            jnp.isfinite(g), g * scale, 0.0), grads)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=stats,
                              opt_state=opt_state, step=state.step + 1),
                {"loss": loss, "grad_norm": gnorm,
                 "skipped": 1.0 - finite.astype(jnp.float32)})

    return train_step


def make_eval_step(model, channels_last=False):
    def loss_fn(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        wave = batch["feats"]
        if channels_last:
            wave = jnp.swapaxes(wave, 1, 2)
        logits, olens = model.apply(variables, wave,
                                    batch["feat_lengths"],
                                    deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return ctc_loss(lp, batch["labels"], olens,
                        batch["label_lengths"], reduction="none")

    @jax.jit
    def eval_step(state: TrainState, batch):
        per_seq = loss_fn(state.params, state.batch_stats, batch)
        w = batch["weight"]
        return {"loss_sum": jnp.sum(per_seq * w), "count": jnp.sum(w)}

    return eval_step
