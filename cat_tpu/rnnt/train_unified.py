"""CUSIDE unified (streaming + offline) RNN-T task module.

Counterpart of /root/reference/cat/rnnt/train_unified.py (:1-388 —
TransducerUnifiedTrainer: joint streaming + non-streaming transducer
loss over chunked encoding with simulated future context) as a
pipeline-drivable task: build_model / init_state / make_train_step /
make_eval_step with the cat_tpu.rnnt.train signatures, so hyper-p.json
can point "train.bin" at cat_tpu.rnnt.train_unified.

TPU design: reuses the CTC CUSIDE machinery (ctc.streaming:
UnifiedEncoder windows chunks as ONE batched gather + one encoder pass,
SimuNet simulates future frames) under a transducer head; the joint
loss is (1−λ)·RNNT(full) + λ·RNNT(chunk) + λ_simu·L1, each term
dispatching to the fused simple loss on a LogAdd joiner exactly like
the offline task (rnnt/train.py:146).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from cat_tpu import models
from cat_tpu.ctc.streaming import SimuNet, UnifiedEncoder
from cat_tpu.models import joiner as joiner_zoo
from cat_tpu.ops.rnnt import rnnt_loss
from cat_tpu.ops.rnnt_simple import rnnt_loss_simple
from cat_tpu.ops.specaug import specaug
from cat_tpu.rnnt.train import _append_eos
from cat_tpu.utils.manager import TrainState


class UnifiedTransducerModel(nn.Module):
    """Unified encoder (full + chunked) + predictor + joiner."""

    uenc: UnifiedEncoder
    predictor: nn.Module
    joiner: nn.Module
    predictor_mask_range: float = 0.1
    num_predictor_mask: int = -1

    def _predict(self, labels, llens, deterministic):
        N = labels.shape[0]
        bos = jnp.zeros((N, 1), jnp.int32)
        pred_in = jnp.concatenate([bos, labels.astype(jnp.int32)],
                                  axis=1)
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
        return pred

    def full_forward(self, feats, flens, labels, llens,
                     deterministic=True):
        enc, olens = self.uenc.full_forward(feats, flens, deterministic)
        pred = self._predict(labels, llens, deterministic)
        return self.joiner(enc, pred), olens

    def chunk_forward(self, feats, flens, labels, llens,
                      deterministic=True, future="simu"):
        enc, olens, simu_l1 = self.uenc.chunk_forward(
            feats, flens, deterministic, future=future)
        pred = self._predict(labels, llens, deterministic)
        return self.joiner(enc, pred), olens, simu_l1

    def __call__(self, feats, flens, labels, llens, deterministic=True):
        return self.full_forward(feats, flens, labels, llens,
                                 deterministic)

    # ---- decoding interface (rnnt/decode.py calls these methods) ----

    def encode(self, feats, flens, deterministic=True):
        return self.uenc.full_forward(feats, flens, deterministic)

    def encode_streaming(self, feats, flens, deterministic=True,
                         future="simu"):
        enc, olens, _ = self.uenc.chunk_forward(feats, flens,
                                                deterministic,
                                                future=future)
        return enc, olens

    def predict(self, tokens, lengths=None, deterministic=True):
        return self.predictor(tokens, lengths,
                              deterministic=deterministic)

    def join(self, enc, pred):
        return self.joiner(enc, pred)

    def predict_step(self, tokens, state):
        return self.predictor.step(tokens, state)


def build_model(cfg: dict, num_classes: int) -> UnifiedTransducerModel:
    """Same config shape as cat_tpu.rnnt.train plus the "unified"
    section of cat_tpu.ctc.train_unified (chunk geometry + SimuNet)."""
    enc_cfg = cfg["encoder"]
    enc_kw = dict(enc_cfg.get("kwargs", {}))
    enc_kw["with_head"] = False
    enc_kw.pop("num_classes", None)
    encoder = models.get_encoder(enc_cfg["type"])(**enc_kw)
    ucfg = cfg.get("unified", {})
    chunk = ucfg.get("chunk", 64)
    right = ucfg.get("right_context", 16)
    simu = SimuNet(feat_dim=ucfg.get("feat_dim", 80),
                   hidden=ucfg.get("simu_hidden", 256), right=right)
    uenc = UnifiedEncoder(encoder=encoder, simu=simu, chunk=chunk,
                          left=ucfg.get("left_context", chunk),
                          right=right)

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
    return UnifiedTransducerModel(
        uenc=uenc, predictor=predictor, joiner=joiner,
        predictor_mask_range=trainer_cfg.get("predictor_mask_range",
                                             0.1),
        num_predictor_mask=trainer_cfg.get("num_predictor_mask", -1))


def init_state(model, tx, feat_dim: int, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    T = 4 * model.uenc.chunk
    feats = jnp.zeros((2, T, feat_dim), jnp.float32)
    flens = jnp.asarray([T, T], jnp.int32)
    labels = jnp.zeros((2, 4), jnp.int32)
    llens = jnp.asarray([4, 4], jnp.int32)
    k1, k2 = jax.random.split(rng)
    v_full = jax.jit(lambda k: model.init(
        k, feats, flens, labels, llens,
        method=model.full_forward))(k1)
    v_chunk = jax.jit(lambda k: model.init(
        k, feats, flens, labels, llens,
        method=model.chunk_forward))(k2)
    # the chunk path adds the SimuNet; merge parameter trees
    params = dict(v_chunk["params"])
    for k, v in v_full["params"].items():
        params.setdefault(k, v)
    batch_stats = v_chunk.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.asarray(0))


def _per_seq(model, logits, labels, olens, llens, joiner_normalized,
             topo):
    """Transducer per-sequence NLL with the same loss dispatch as the
    offline task (rnnt/train.py:146,172-188)."""
    if isinstance(model.joiner, joiner_zoo.LogAdd):
        f, g = logits
        return rnnt_loss_simple(f.astype(jnp.float32),
                                g.astype(jnp.float32), labels, olens,
                                llens, reduction="none")
    lp = logits.astype(jnp.float32)
    if not joiner_normalized:
        lp = jax.nn.log_softmax(lp, axis=-1)
    if topo in ("rna", "ctct"):
        from cat_tpu.ops.rnnt_rna import rnnt_loss_rna

        return rnnt_loss_rna(lp, labels, olens, llens, reduction="none")
    return rnnt_loss(lp, labels, olens, llens, reduction="none")


def make_loss_fn(model, specaug_cfg=None, joiner_normalized=False,
                 topo="rnnt", eos_id=-1, lamb_chunk=0.5, lamb_simu=1.0,
                 future="simu"):
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

        def run(method, **kw):
            out = model.apply(variables, feats, flens, labels, llens,
                              deterministic=not train, mutable=mutable,
                              rngs=rngs, method=method, **kw)
            return out if mutable else (out, {})

        (f_out, f_lens), vars1 = run(model.full_forward)
        ((c_out, c_lens, simu_l1)), vars2 = run(model.chunk_forward,
                                                future=future)
        new_stats = (vars2 or vars1).get("batch_stats", batch_stats) \
            if mutable else batch_stats

        w = batch["weight"]

        def wmean(per_seq):
            return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss_full = wmean(_per_seq(model, f_out, labels, f_lens, llens,
                                   joiner_normalized, topo))
        loss_chunk = wmean(_per_seq(model, c_out, labels, c_lens, llens,
                                    joiner_normalized, topo))
        loss = ((1 - lamb_chunk) * loss_full + lamb_chunk * loss_chunk
                + lamb_simu * simu_l1)
        return loss, (new_stats, loss_full, loss_chunk, simu_l1)

    return loss_fn


def make_train_step(model, tx, specaug_cfg=None, grad_clip=5.0,
                    joiner_normalized=False, topo="rnnt", eos_id=-1,
                    grad_accum_fold=1, lamb_chunk=0.5, lamb_simu=1.0,
                    future="simu"):
    from cat_tpu.ctc.train import (_make_accum_train_step, _tree_where,
                                   set_lr)

    loss_fn = make_loss_fn(model, specaug_cfg, joiner_normalized, topo,
                           eos_id, lamb_chunk, lamb_simu, future)

    if grad_accum_fold > 1:
        # per-batch joint loss broadcast as per_seq (same adaptation as
        # ctc/train_unified.py:63-79) keeps the fold bookkeeping exact
        def fold_loss(params, batch_stats, batch, rng, train):
            loss, (stats, _, _, _) = loss_fn(params, batch_stats, batch,
                                             rng, train)
            per_seq = jnp.broadcast_to(loss, batch["weight"].shape)
            return loss, (stats, per_seq)

        return _make_accum_train_step(fold_loss, tx, grad_clip,
                                      grad_accum_fold)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (stats, lf, lc, l1)), grads = jax.value_and_grad(
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
                    batch_stats=_tree_where(finite, stats,
                                            state.batch_stats),
                    opt_state=_tree_where(finite, opt_state, opt_state0),
                    step=state.step + 1),
                {"loss": loss, "loss_full": lf, "loss_chunk": lc,
                 "loss_simu": l1, "grad_norm": gnorm,
                 "skipped": (~finite).astype(jnp.int32)})

    return train_step


def make_eval_step(model, joiner_normalized=False, topo="rnnt",
                   eos_id=-1, lamb_chunk=0.5, future="simu", **_unused):
    loss_fn = make_loss_fn(model, None, joiner_normalized, topo, eos_id,
                           lamb_chunk, 0.0, future)

    @jax.jit
    def eval_step(state: TrainState, batch):
        loss, _ = loss_fn(state.params, state.batch_stats, batch,
                          jax.random.PRNGKey(0), False)
        w = batch["weight"]
        cnt = jnp.sum(w)
        return {"loss_sum": loss * cnt, "count": cnt}

    return eval_step
