"""JSA-SPG: joint speech-phoneme-grapheme training with MIS sampling.

Counterpart of /root/reference/cat/ctc/train_jsa.py:78-250 (AMTrainer
with S2P + P2G + G2P models, metropolis-independence-sampling from the
G2P proposal, per-utterance cache of accepted phoneme sequences,
optional supervised substitution) and its Manager variant
(cat/shared/manager_jsa.py — 4-loss logging + acceptance rate).

Design: the three CTC losses are jitted device programs; the proposal
(G2P n-best via prefix beam search) and the accept/reject bookkeeping
run on host — sampling is inherently data-dependent control flow and
cheap next to the model passes.

Latent convention: z = phoneme id sequence; y = grapheme id sequence;
x = speech features. Joint model p(z, y | x) ≈ p_s2p(z|x)·p_p2g(y|z);
proposal q(z|y) from the G2P model.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cat_tpu import models
from cat_tpu.ctc.decode import prefix_beam_search
from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.utils.manager import TrainState


def build_models(cfg: dict, num_phonemes: int, num_graphemes: int):
    """cfg: {"s2p": {encoder...}, "p2g": {...}, "g2p": {...}}."""
    s2p_kw = dict(cfg["s2p"].get("kwargs", {}))
    s2p_kw["num_classes"] = num_phonemes
    s2p = models.get_encoder(cfg["s2p"]["type"])(**s2p_kw)

    p2g_kw = dict(cfg["p2g"].get("kwargs", {}))
    p2g_kw.update(vocab_size=num_phonemes, num_classes=num_graphemes)
    p2g = models.get_encoder(cfg["p2g"]["type"])(**p2g_kw)

    g2p_kw = dict(cfg["g2p"].get("kwargs", {}))
    g2p_kw.update(vocab_size=num_graphemes, num_classes=num_phonemes)
    g2p = models.get_encoder(cfg["g2p"]["type"])(**g2p_kw)
    return s2p, p2g, g2p


@dataclass
class JsaState:
    """Host-side sampler state: per-utterance accepted z and its
    importance weight (the reference's phoneme-sequence cache)."""

    cache: Dict[str, tuple] = field(default_factory=dict)
    accepted: int = 0
    proposed: int = 0

    @property
    def acceptance_rate(self):
        return self.accepted / max(self.proposed, 1)


class JsaTrainer:
    """Orchestrates the three models + MIS sampling."""

    def __init__(self, s2p, p2g, g2p, tx, feat_dim, num_phonemes,
                 num_graphemes, num_samples=4, beam_width=8, rng=None,
                 upsample=2):
        self.s2p, self.p2g, self.g2p = s2p, p2g, g2p
        self.tx = tx
        self.K = num_samples
        self.beam_width = beam_width
        self.num_phonemes = num_phonemes
        self.num_graphemes = num_graphemes
        # P2G/G2P consume token sequences; CTC needs input longer than
        # output, so token inputs are repeated `upsample` times
        # (the reference achieves this with its own length handling).
        self.upsample = upsample
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        feats = jnp.zeros((2, 16, feat_dim), jnp.float32)
        lens = jnp.asarray([16, 16], jnp.int32)
        toks = jnp.zeros((2, 12), jnp.int32)
        tlens = jnp.asarray([12, 12], jnp.int32)
        p_s2p = jax.jit(partial(s2p.init, deterministic=True))(
            k1, feats, lens)["params"]
        p_p2g = jax.jit(partial(p2g.init, deterministic=True))(
            k2, toks, tlens)["params"]
        p_g2p = jax.jit(partial(g2p.init, deterministic=True))(
            k3, toks, tlens)["params"]
        self.params = {"s2p": p_s2p, "p2g": p_p2g, "g2p": p_g2p}
        self.opt_state = tx.init(self.params)
        self.sampler = JsaState()
        self._np_rng = np.random.default_rng(0)

        self._s2p_logits = jax.jit(lambda p, x, l: s2p.apply(
            {"params": p}, x, l, deterministic=True))
        self._g2p_logits = jax.jit(lambda p, t, l: g2p.apply(
            {"params": p}, t, l, deterministic=True))
        self._p2g_logits = jax.jit(lambda p, t, l: p2g.apply(
            {"params": p}, t, l, deterministic=True))
        self._grad_step = jax.jit(self._make_grad_step())

    # ---------------- losses ----------------

    def _make_grad_step(self):
        s2p, p2g, g2p, tx = self.s2p, self.p2g, self.g2p, self.tx

        def loss_fn(params, batch, rng):
            k1, k2, k3 = jax.random.split(rng, 3)
            lg_s, ol_s = s2p.apply({"params": params["s2p"]},
                                   batch["feats"],
                                   batch["feat_lengths"],
                                   deterministic=False,
                                   rngs={"dropout": k1})
            l_s2p = _wmean(ctc_loss(
                jax.nn.log_softmax(lg_s, -1), batch["z"], ol_s,
                batch["z_lengths"], reduction="none"), batch["weight"])
            lg_p, ol_p = p2g.apply({"params": params["p2g"]},
                                   batch["z_up"], batch["z_up_lengths"],
                                   deterministic=False,
                                   rngs={"dropout": k2})
            l_p2g = _wmean(ctc_loss(
                jax.nn.log_softmax(lg_p, -1), batch["y"], ol_p,
                batch["y_lengths"], reduction="none"), batch["weight"])
            lg_g, ol_g = g2p.apply({"params": params["g2p"]},
                                   batch["y_up"], batch["y_up_lengths"],
                                   deterministic=False,
                                   rngs={"dropout": k3})
            l_g2p = _wmean(ctc_loss(
                jax.nn.log_softmax(lg_g, -1), batch["z"], ol_g,
                batch["z_lengths"], reduction="none"), batch["weight"])
            total = l_s2p + l_p2g + l_g2p
            return total, (l_s2p, l_p2g, l_g2p)

        def step(params, opt_state, batch, rng, lr):
            from cat_tpu.ctc.train import set_lr

            (total, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng)
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, 5.0 / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            opt_state = set_lr(opt_state, lr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": total,
                                       "loss_s2p": parts[0],
                                       "loss_p2g": parts[1],
                                       "loss_g2p": parts[2]}

        return step

    # ---------------- sampling ----------------

    def _score_z(self, feats, flens, y, z):
        """log p_s2p(z|x) + log p_p2g(y|z) for one utterance."""
        lg_s, ol_s = self._s2p_logits(self.params["s2p"],
                                      jnp.asarray(feats[None]),
                                      jnp.asarray([flens], np.int32))
        lp_s = jax.nn.log_softmax(lg_s, -1)
        z_arr = jnp.asarray(np.asarray(z, np.int32)[None])
        ll_s = -float(ctc_loss(lp_s, z_arr,
                               ol_s, jnp.asarray([len(z)], jnp.int32),
                               reduction="none")[0])
        z_up = np.repeat(np.asarray(z, np.int32), self.upsample)
        lg_p, ol_p = self._p2g_logits(self.params["p2g"],
                                      jnp.asarray(z_up[None]),
                                      jnp.asarray([len(z_up)], np.int32))
        lp_p = jax.nn.log_softmax(lg_p, -1)
        y_arr = jnp.asarray(np.asarray(y, np.int32)[None])
        ll_p = -float(ctc_loss(lp_p, y_arr, ol_p,
                               jnp.asarray([len(y)], jnp.int32),
                               reduction="none")[0])
        return ll_s + ll_p

    def sample_z(self, uid, feats, flens, y):
        """MIS: propose from G2P n-best, accept/reject vs cache."""
        y_up = np.repeat(np.asarray(y, np.int32), self.upsample)
        lg, olen = self._g2p_logits(self.params["g2p"],
                                    jnp.asarray(y_up[None]),
                                    jnp.asarray([len(y_up)], np.int32))
        lp = np.asarray(jax.nn.log_softmax(lg, -1))[0]
        nbest = prefix_beam_search(lp, int(olen[0]),
                                   beam_width=self.beam_width,
                                   nbest=self.K)
        cands = [list(pre) for _, pre in nbest if len(pre) > 0]
        if not cands:
            cands = [[int(v) for v in
                      self._np_rng.integers(1, self.num_phonemes,
                                            max(len(y), 1))]]
        scores = np.asarray([s for s, pre in nbest if len(pre) > 0]
                            or [0.0])
        q = np.exp(scores - scores.max())
        q = q / q.sum()
        k = int(self._np_rng.choice(len(cands), p=q))
        z_new = cands[k]
        logw_new = self._score_z(feats, flens, y, z_new) \
            - float(np.log(q[k]))
        self.sampler.proposed += 1
        cached = self.sampler.cache.get(uid)
        if cached is None:
            self.sampler.cache[uid] = (z_new, logw_new)
            self.sampler.accepted += 1
            return z_new
        z_old, logw_old = cached
        if np.log(self._np_rng.random() + 1e-12) < logw_new - logw_old:
            self.sampler.cache[uid] = (z_new, logw_new)
            self.sampler.accepted += 1
            return z_new
        return z_old

    # ---------------- train step ----------------

    def train_step(self, batch, rng, supervised_z=None, lr=None):
        """batch: Batch with grapheme labels; supervised_z: optional
        {uid: phoneme ids} for the supervised-substitution mode."""
        B = batch.feats.shape[0]
        zs = []
        for j in range(B):
            uid = batch.uids[j % len(batch.uids)] \
                if batch.uids else str(j)
            if batch.weight[j] == 0:
                zs.append([1])
                continue
            y = batch.labels[j, : batch.label_lengths[j]]
            if supervised_z and uid in supervised_z:
                zs.append(list(supervised_z[uid]))
            else:
                zs.append(self.sample_z(
                    uid, batch.feats[j, : batch.feat_lengths[j]],
                    int(batch.feat_lengths[j]), y))
        zmax = max(max(len(z) for z in zs), 1)
        z_arr = np.zeros((B, zmax), np.int32)
        z_len = np.zeros((B,), np.int32)
        for j, z in enumerate(zs):
            z_arr[j, : len(z)] = z
            z_len[j] = len(z)
        up = self.upsample
        z_up = np.repeat(z_arr, up, axis=1)
        y_up = np.repeat(batch.labels, up, axis=1)
        dev_batch = dict(
            feats=jnp.asarray(batch.feats),
            feat_lengths=jnp.asarray(batch.feat_lengths),
            y=jnp.asarray(batch.labels),
            y_lengths=jnp.asarray(batch.label_lengths),
            z=jnp.asarray(z_arr), z_lengths=jnp.asarray(z_len),
            z_up=jnp.asarray(z_up),
            z_up_lengths=jnp.asarray(z_len * up),
            y_up=jnp.asarray(y_up),
            y_up_lengths=jnp.asarray(batch.label_lengths * up),
            weight=jnp.asarray(batch.weight))
        if lr is None:
            lr = jnp.float32(1e-3)
        self.params, self.opt_state, metrics = self._grad_step(
            self.params, self.opt_state, dev_batch, rng,
            jnp.float32(lr))
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["acceptance_rate"] = self.sampler.acceptance_rate
        return metrics


def _wmean(per_seq, w):
    return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)


def manager_steps(trainer: JsaTrainer, supervised_z=None):
    """Manager-compatible adapter (the unified pipeline task contract,
    manager_jsa.py:34 role): returns (state, train_step, eval_step).

    - state: TrainState carrying the trainer's 3-model params +
      opt_state, so Manager checkpointing/resume works unchanged.
    - train_step(state, batch, lr, rng): batch is the loader's Batch
      OBJECT (uids feed the MIS cache) — pipeline sets
      Manager(batch_transform=lambda b: b).
    - eval_step: dev loss = −log p(ẑ|x) − log p(y|ẑ) at the greedy
      S2P phoneme sequence ẑ — a tractable cascade proxy of the joint
      likelihood the sampler optimizes."""
    from cat_tpu.ctc.decode import greedy_decode
    from cat_tpu.utils.manager import TrainState

    def train_step(state, batch, lr, rng):
        trainer.params = state.params
        trainer.opt_state = state.opt_state
        metrics = trainer.train_step(batch, rng,
                                     supervised_z=supervised_z, lr=lr)
        new_state = state.replace(params=trainer.params,
                                  opt_state=trainer.opt_state,
                                  step=state.step + 1)
        return new_state, metrics

    @jax.jit
    def _p2g_per_seq(params, z_up, z_up_lens, y, y_lens):
        lg, ol = trainer.p2g.apply({"params": params}, z_up, z_up_lens,
                                   deterministic=True)
        return ctc_loss(jax.nn.log_softmax(lg.astype(jnp.float32), -1),
                        y, ol, y_lens, reduction="none")

    @jax.jit
    def _s2p_per_seq(params, feats, flens, z, z_lens):
        lg, ol = trainer.s2p.apply({"params": params}, feats, flens,
                                   deterministic=True)
        return ctc_loss(jax.nn.log_softmax(lg.astype(jnp.float32), -1),
                        z, ol, z_lens, reduction="none")

    def eval_step(state, batch):
        lg, ol = trainer._s2p_logits(state.params["s2p"],
                                     jnp.asarray(batch.feats),
                                     jnp.asarray(batch.feat_lengths))
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        zs = [list(z) if len(z) else [1]
              for z in greedy_decode(lp, ol)]
        B = len(zs)
        zmax = max(max(len(z) for z in zs), 1)
        z = np.zeros((B, zmax), np.int32)
        zl = np.zeros((B,), np.int32)
        for j, seq in enumerate(zs):
            z[j, : len(seq)] = seq
            zl[j] = len(seq)
        up = trainer.upsample
        per_s2p = _s2p_per_seq(state.params["s2p"],
                               jnp.asarray(batch.feats),
                               jnp.asarray(batch.feat_lengths),
                               jnp.asarray(z), jnp.asarray(zl))
        per_p2g = _p2g_per_seq(state.params["p2g"],
                               jnp.asarray(np.repeat(z, up, axis=1)),
                               jnp.asarray(zl * up),
                               jnp.asarray(batch.labels),
                               jnp.asarray(batch.label_lengths))
        w = jnp.asarray(batch.weight)
        per = per_s2p + per_p2g
        return {"loss_sum": jnp.sum(per * w), "count": jnp.sum(w)}

    state = TrainState(params=trainer.params, batch_stats={},
                       opt_state=trainer.opt_state, step=jnp.asarray(0))
    return state, train_step, eval_step
