"""TRF / EBM LM trainer (NCE and dynamic NCE).

Counterpart of /root/reference/cat/lm/trf/train.py (TRFLMTrainer):
drives cat_tpu.lm.trf through the same Manager/pipeline machinery as
the CE trainer (cat_tpu.lm.train) — select with
hyper["train"]["bin"] = "cat_tpu.lm.train_trf".

config.json:
  "decoder": {"type": "TRFNCE", "kwargs": {
      "energy_func": "sumtargetlogit" | "hidden2scalar" | ...,
      "method": "nce" | "dnce", "noise_rate": 1.0, "alpha": 0.25,
      "noise_max_len": 64,
      "ebm":   {"type": "LSTMPredictor", "kwargs": {...}},
      "noise": {"type": "LSTMPredictor", "kwargs": {...}}}}

The length prior π comes from the packed training corpus (TRFLM
pulls it from CorpusDataset the same way, model.py:352-354).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cat_tpu.lm.trf import TRFNCE, hist_length, make_trf_loss
from cat_tpu.utils.manager import TrainState

# kwargs consumed by the loss, not the module
_LOSS_KEYS = ("method", "noise_rate", "alpha", "noise_max_len",
              "greedy_sampling")


def build_model(cfg: dict, num_classes: int) -> TRFNCE:
    kw = dict(cfg["decoder"].get("kwargs", {}))
    for k in _LOSS_KEYS:
        kw.pop(k, None)
    kw["vocab_size"] = num_classes
    return TRFNCE(**kw)


def loss_options(cfg: dict) -> dict:
    kw = cfg["decoder"].get("kwargs", {})
    return {
        "method": kw.get("method", "nce"),
        "noise_rate": kw.get("noise_rate", 1.0),
        "alpha": kw.get("alpha", 0.25),
        "max_len": kw.get("noise_max_len", 64),
        "greedy_sampling": kw.get("greedy_sampling", False),
    }


def init_state(model: TRFNCE, tx, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokens = jnp.zeros((2, 8), jnp.int32)
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, tokens, tokens, jnp.asarray([8, 8], jnp.int32))
    return TrainState(params=variables["params"], batch_stats={},
                      opt_state=tx.init(variables["params"]),
                      step=jnp.asarray(0))


def length_prior(dataset, max_len: int = 200) -> np.ndarray:
    lens = [min(dataset.token_length(i) + 1, max_len - 1)
            for i in range(len(dataset))]
    return hist_length(np.asarray(lens), max_len)


def make_train_step(model: TRFNCE, tx, pi, opts: dict, grad_clip=5.0):
    from cat_tpu.ctc.train import set_lr

    loss_fn = make_trf_loss(model, pi, **opts)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        gnorm = optax.global_norm(grads)
        if grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        out = dict(metrics)
        out.update(loss=loss, grad_norm=gnorm)
        return (state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1), out)

    return train_step


def make_eval_step(model: TRFNCE, pi, opts: dict):
    """Dev metric: the NCE 'true' binary-classification loss with a
    fixed sampling key — a proper discriminative objective (lower is
    better), comparable across evals."""
    loss_fn = make_trf_loss(model, pi, **{**opts, "method": "nce"})

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, metrics = loss_fn(state.params, batch,
                             jax.random.PRNGKey(1234))
        B = batch["tokens"].shape[0]
        return {"loss_sum": metrics["loss_true"] * B,
                "count": jnp.asarray(B, jnp.float32)}

    return eval_step
