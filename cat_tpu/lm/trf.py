"""Trans-dimensional random field (TRF) LMs with NCE / dynamic NCE.

Counterpart of /root/reference/cat/lm/trf/model.py:21-1365 (EBM / TRFLM /
REBM classes) and trf/train.py — the full-depth version of the plain
neural-energy NCE in cat_tpu.lm.ebm:

- energy-function variants over an underlying network
  (model.py:243-317): sumtargetlogit (per-token target logits — the
  token-level-feature form), sumtokenlogit, hidden2scalar,
  logsumexplogit, maxlogit;
- TRF length handling (model.py:335-374): trainable per-length
  normalization ζ_l (ζ_0 ≡ 0, init slope log V) and empirical length
  prior π from the Laplace-smoothed data length histogram
  (hist_length, model.py:321-333), trf_score = −E − ζ_l + log π_l;
- a NEURAL noise model sampled ancestrally ON DEVICE (lax.scan over
  the predictor's step fn, replacing model.py:490-570's token loop);
- NCE (frozen noise model) and dynamic NCE (model.py:571-704): α-
  interpolated mixture p̃ = α·p_m + (1−α)·p_n on both sides plus the
  noise-model ML term that drags p_n toward the data;
- REBM residual scoring (model.py:712-735): score = log p_n − E.

TPU design: one jitted train step; noise sampling, both scoring passes
and the NCE losses are a single program (no host round trips). All
shapes static: noise lengths are drawn from π but tokens are generated
to max_len and masked.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from cat_tpu import models
from cat_tpu.utils.manager import TrainState

EPS = 1e-30


def hist_length(lengths, max_len: int = 200):
    """Laplace-smoothed length histogram π (model.py:321-333).
    π[0] = 0; returns np.float32 (max_len,)."""
    max_len = int(max(max_len, np.max(lengths) + 1))
    hist = np.zeros(max_len, np.float64)
    for l in lengths:
        hist[int(l)] += 1
    hist[0] = 0.0
    hist[1:] += 1.0
    hist /= hist.sum() + max_len
    return hist.astype(np.float32)


class TRFNCE(nn.Module):
    """TRF energy model + neural noise model in one parameter tree.

    ebm / noise: decoder-zoo configs ({"type", "kwargs"}); the noise
    model must support .step/.init_state (LSTMPredictor does) for
    on-device ancestral sampling.
    """

    vocab_size: int
    ebm: Any = None            # {"type": ..., "kwargs": {...}}
    noise: Any = None
    energy_func: str = "sumtargetlogit"
    max_len: int = 200
    zeta_factor: float = 0.0   # 0 → log(vocab) slope (model.py:360-370)

    def setup(self):
        ecfg = self.ebm or {"type": "LSTMPredictor", "kwargs": {}}
        ekw = dict(ecfg.get("kwargs", {}))
        ekw.setdefault("vocab_size", self.vocab_size)
        if self.energy_func == "hidden2scalar":
            ekw["with_head"] = False
        else:
            ekw.setdefault("num_classes", self.vocab_size)
            ekw["with_head"] = True
        self.udlying_nn = models.get_decoder(ecfg["type"])(**ekw)
        if self.energy_func == "hidden2scalar":
            self.energy_lin = nn.Dense(1)

        ncfg = self.noise or {"type": "LSTMPredictor",
                              "kwargs": {"hdim": 128}}
        nkw = dict(ncfg.get("kwargs", {}))
        nkw.setdefault("vocab_size", self.vocab_size)
        nkw.setdefault("num_classes", self.vocab_size)
        nkw["with_head"] = True
        self.noise_model = models.get_decoder(ncfg["type"])(**nkw)

        slope = self.zeta_factor or math.log(self.vocab_size)
        self.zeta = self.param(
            "zeta",
            lambda key, shape: slope * jnp.arange(-1.0, shape[0] - 1.0)
            .at[0].set(0.0), (self.max_len,))

    # ---- energy / phi ----

    def energy(self, tokens, targets, lengths, deterministic=True):
        """E(x) per sequence (model.py:243-317). tokens are the inputs
        ([<s>, w1..wn] convention of lm.train), targets the shifted
        sequence ([w1..wn, </s>])."""
        mask = (jnp.arange(tokens.shape[1])[None, :]
                < lengths[:, None])
        if self.energy_func == "hidden2scalar":
            hid, _ = self.udlying_nn(tokens, lengths,
                                     deterministic=deterministic)
            e = self.energy_lin(hid)[..., 0]
            return jnp.sum(jnp.where(mask, e, 0.0), axis=1)
        logits, _ = self.udlying_nn(tokens, lengths,
                                    deterministic=deterministic)
        logits = logits.astype(jnp.float32)
        if self.energy_func == "sumtargetlogit":
            w = jnp.take_along_axis(logits, targets[..., None],
                                    axis=-1)[..., 0]
            return -jnp.sum(jnp.where(mask, w, 0.0), axis=1)
        if self.energy_func == "sumtokenlogit":
            w = jnp.take_along_axis(logits, tokens[..., None],
                                    axis=-1)[..., 0]
            return -jnp.sum(jnp.where(mask, w, 0.0), axis=1)
        if self.energy_func == "logsumexplogit":
            return -jax.nn.logsumexp(logits[:, 0, :], axis=-1)
        if self.energy_func == "maxlogit":
            return -jnp.max(logits[:, 0, :], axis=-1)
        raise ValueError(self.energy_func)

    def phi(self, tokens, targets, lengths, deterministic=True):
        """φ(x) = −E(x) − ζ_{|x|} (model.py:376-384)."""
        e = self.energy(tokens, targets, lengths, deterministic)
        z = self.zeta[jnp.clip(lengths, 0, self.max_len - 1)]
        return -e - z

    # ---- noise model ----

    def noise_nll(self, tokens, targets, lengths):
        """Per-sequence noise-LM NLL (nats); grads flow to the noise
        model (used by the DNCE ML term)."""
        logits, _ = self.noise_model(tokens, lengths,
                                     deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ll = jnp.take_along_axis(lp, targets[..., None], -1)[..., 0]
        mask = (jnp.arange(tokens.shape[1])[None, :]
                < lengths[:, None])
        return -jnp.sum(jnp.where(mask, ll, 0.0), axis=1)

    def noise_step(self, tokens, state):
        out, st = self.noise_model.step(tokens, state)
        return out, st

    def noise_init_state(self, batch_size):
        return self.noise_model.init_state(batch_size)

    def __call__(self, tokens, targets, lengths, deterministic=True):
        """Init path: touches every parameter."""
        p = self.phi(tokens, targets, lengths, deterministic)
        n = self.noise_nll(tokens, targets, lengths)
        return p, n


def make_noise_sampler(model: TRFNCE, num: int, max_len: int,
                       pi_noise: np.ndarray, greedy: bool = False):
    """On-device ancestral sampling from the noise LM
    (model.py:490-570): lengths ~ π_noise, then a lax.scan over the
    predictor step. Returns a jittable fn(params, rng) ->
    (tokens (num, max_len) with BOS at [:,0], targets, lengths,
    log_pn = Σ token log-probs + log π[len])."""
    log_pi = jnp.log(jnp.asarray(pi_noise) + EPS)

    def sample(params, rng):
        k_len, k_tok = jax.random.split(rng)
        lens = jax.random.categorical(
            k_len, jnp.broadcast_to(log_pi, (num, log_pi.shape[0])))
        lens = jnp.clip(lens, 1, max_len - 1).astype(jnp.int32)

        def step(carry, key):
            st, prev = carry
            out, st = model.apply({"params": params}, prev, st,
                                  method=model.noise_step)
            lp = jax.nn.log_softmax(out.astype(jnp.float32), -1)
            if greedy:
                nxt = jnp.argmax(lp, axis=-1)
            else:
                nxt = jax.random.categorical(key, lp)
            tok_lp = jnp.take_along_axis(lp, nxt[:, None], -1)[:, 0]
            return (st, nxt.astype(jnp.int32)), (nxt.astype(jnp.int32),
                                                 tok_lp)

        st0 = model.apply({"params": params}, num,
                          method=model.noise_init_state)
        bos = jnp.zeros((num,), jnp.int32)
        keys = jax.random.split(k_tok, max_len - 1)
        _, (toks, lps) = jax.lax.scan(step, (st0, bos), keys)
        toks = jnp.swapaxes(toks, 0, 1)     # (num, max_len-1)
        lps = jnp.swapaxes(lps, 0, 1)
        # inputs [<s>, w1..] / targets [w1..]; position i generated the
        # (i+1)-th input token, valid while i+1 < len
        valid = (jnp.arange(1, max_len)[None, :] < lens[:, None])
        tokens = jnp.concatenate(
            [bos[:, None], jnp.where(valid, toks, 0)], axis=1)
        targets = jnp.concatenate(
            [jnp.where(valid, toks, 0),
             jnp.zeros((num, 1), jnp.int32)], axis=1)
        log_pn = (jnp.sum(jnp.where(valid, lps, 0.0), axis=1)
                  + log_pi[jnp.clip(lens, 0, log_pi.shape[0] - 1)])
        return tokens, targets, lens, log_pn

    return sample


def make_trf_loss(model: TRFNCE, pi: np.ndarray, method: str = "nce",
                  noise_rate: float = 1.0, alpha: float = 0.25,
                  max_len: int = 64, greedy_sampling: bool = False):
    """NCE / DNCE surrogate loss (model.py:571-704).

    Returns loss_fn(params, batch, rng) -> (loss, metrics) where batch
    has tokens/targets/lengths (lm.train.LmLoader convention). The
    stop-gradient weights p1/p0 reproduce the reference's
    torch.no_grad() sigmoid weighting; in "nce" mode all noise-model
    outputs are stop-gradded (frozen noise, model.py:73-77)."""
    log_pi = jnp.log(jnp.asarray(pi) + EPS)
    log_nu = math.log(max(noise_rate, EPS))

    def log_pm_of(params, tokens, targets, lengths, det=True):
        ph = model.apply({"params": params}, tokens, targets, lengths,
                         det, method=model.phi)
        lp = ph + log_pi[jnp.clip(lengths, 0, log_pi.shape[0] - 1)]
        return lp, ph

    def loss_fn(params, batch, rng):
        tokens, targets = batch["tokens"], batch["targets"]
        lengths = batch["lengths"]
        B = tokens.shape[0]

        log_pm, phi = log_pm_of(params, tokens, targets, lengths,
                                det=False)
        noise_nll = model.apply({"params": params}, tokens, targets,
                                lengths, method=model.noise_nll)
        log_pn = -noise_nll

        if method == "nce":
            log_pn = jax.lax.stop_gradient(log_pn)
            n_noise = max(int(B * noise_rate), 1)
            sampler = make_noise_sampler(model, n_noise, max_len, pi,
                                         greedy_sampling)
            ntok, ntar, nlen, log_pn_noise = jax.lax.stop_gradient(
                sampler(params, rng))
            log_pm_noise, phi_noise = log_pm_of(params, ntok, ntar,
                                                nlen)
            p1 = jax.lax.stop_gradient(
                jax.nn.sigmoid(log_nu - log_pm + log_pn))
            p0 = jax.lax.stop_gradient(
                jax.nn.sigmoid(-log_nu + log_pm_noise - log_pn_noise))
            loss_data = -jnp.mean(p1 * phi)
            loss_noise = noise_rate * jnp.mean(p0 * phi_noise)
            loss = loss_data + loss_noise
            metrics = {
                "loss_data": loss_data, "loss_noise": loss_noise,
                "acc_data": jnp.mean((p1 < 0.5).astype(jnp.float32)),
                "acc_noise": jnp.mean((p0 < 0.5).astype(jnp.float32)),
                "loss_true": (-jnp.mean(jnp.log1p(-p1 + EPS))
                              - noise_rate
                              * jnp.mean(jnp.log1p(-p0 + EPS))),
            }
            return loss, metrics

        # ---- dynamic NCE (model.py:611-704) ----
        a = float(alpha)
        loss_noisem_ml = (jnp.sum(noise_nll)
                          / jnp.maximum(jnp.sum(lengths), 1))
        log_pn_sg = jax.lax.stop_gradient(log_pn)

        n_in_data = int(B * (1.0 - a) / a) if a < 1.0 else 0
        if n_in_data > 0:
            k1, rng = jax.random.split(rng)
            sampler1 = make_noise_sampler(model, n_in_data, max_len,
                                          pi, greedy_sampling)
            dtok, dtar, dlen, d_log_pn = jax.lax.stop_gradient(
                sampler1(params, k1))
            d_log_pm, d_phi = log_pm_of(params, dtok, dtar, dlen)
            log_pm_all = jnp.concatenate([log_pm, d_log_pm])
            log_pn_all = jnp.concatenate([log_pn_sg, d_log_pn])
            phi_all = jnp.concatenate([phi, d_phi])
            log_pm_all = jnp.logaddexp(math.log(a) + log_pm_all,
                                       math.log1p(-a) + log_pn_all)
        else:
            log_pm_all, log_pn_all, phi_all = log_pm, log_pn_sg, phi

        p1 = jax.lax.stop_gradient(
            jax.nn.sigmoid(log_nu - log_pm_all + log_pn_all))
        loss_data = -jnp.sum(p1 * phi_all) / B * a

        n_noise = max(int(B * noise_rate / a), 1)
        k2, rng = jax.random.split(rng)
        sampler2 = make_noise_sampler(model, n_noise, max_len, pi,
                                      greedy_sampling)
        ntok, ntar, nlen, log_pn_noise = jax.lax.stop_gradient(
            sampler2(params, k2))
        log_pm_noise, phi_noise = log_pm_of(params, ntok, ntar, nlen)
        if a < 1.0:
            log_pm_noise = jnp.logaddexp(
                math.log(a) + log_pm_noise,
                math.log1p(-a) + log_pn_noise)
        p0 = jax.lax.stop_gradient(
            jax.nn.sigmoid(log_pm_noise - log_pn_noise - log_nu))
        loss_noise = jnp.sum(p0 * phi_noise) / B * a

        loss = loss_data + loss_noise + loss_noisem_ml
        metrics = {
            "loss_data": loss_data, "loss_noise": loss_noise,
            "loss_noise_kl": loss_noisem_ml,
            "acc_data": jnp.mean((p1 < 0.5).astype(jnp.float32)),
            "acc_noise": jnp.mean((p0 < 0.5).astype(jnp.float32)),
            "ppl_noiseM_data": jnp.exp(loss_noisem_ml),
        }
        return loss, metrics

    return loss_fn


def rebm_score(model: TRFNCE, params, tokens, targets, lengths):
    """Residual-EBM rescoring score = log p_n(x) − E(x)
    (model.py:721-735)."""
    e = model.apply({"params": params}, tokens, targets, lengths,
                    method=model.energy)
    nll = model.apply({"params": params}, tokens, targets, lengths,
                      method=model.noise_nll)
    return -nll - e


def trf_score(model: TRFNCE, params, pi, tokens, targets, lengths):
    """Normalized-up-to-constant TRF log-score for rescoring
    (model.py:376-384)."""
    log_pi = jnp.log(jnp.asarray(pi) + EPS)
    ph = model.apply({"params": params}, tokens, targets, lengths,
                     method=model.phi)
    return ph + log_pi[jnp.clip(lengths, 0, log_pi.shape[0] - 1)]


# ---------------------------------------------------------------------
# EBM trained by importance sampling / MCMC (model.py:797-1365 EBM_IS:
# methods IS / MIS / Gibbs). The maximum-likelihood gradient of an EBM,
# ∇ −log p(x) = ∇E(data) − E_model[∇E], needs samples from the model;
# these estimators differ in how they get them. TPU design: all three
# are single jitted programs; the MIS/Gibbs chains are FUNCTIONAL state
# (passed in and out of the step) instead of the reference's mutable
# module attributes, so they checkpoint and shard like everything else.
# ---------------------------------------------------------------------


def make_ebm_is_loss(model: TRFNCE, pi, method: str = "is",
                     noise_rate: float = 1.0, max_len: int = 64,
                     update_q: bool = True, greedy_sampling=False):
    """Returns loss_fn(params, batch, rng, chain) ->
    ((loss, (metrics, new_chain))).

    method "is":   self-normalized importance sampling from the noise
                   LM (model.py:1226-1237): weights softmax(log p−log q).
    method "mis":  Metropolis independence sampler with a persistent
                   parallel chain (MIS_step_parallel, model.py:842-905):
                   accept x' w.p. min(1, w(x')/w(x)), w = p/q.
    update_q: also train the proposal by ML on data (the reference's
    update path when the noise model is not frozen)."""
    log_pi = jnp.log(jnp.asarray(pi) + EPS)

    def energy_of(params, tokens, targets, lengths):
        return model.apply({"params": params}, tokens, targets,
                           lengths, method=model.energy)

    def q_logp(params, tokens, targets, lengths):
        nll = model.apply({"params": params}, tokens, targets, lengths,
                          method=model.noise_nll)
        return -nll

    def loss_fn(params, batch, rng, chain=None):
        tokens, targets = batch["tokens"], batch["targets"]
        lengths = batch["lengths"]
        B = tokens.shape[0]
        n_noise = max(int(B * noise_rate), 1)
        e_data = energy_of(params, tokens, targets, lengths)
        loss_data = jnp.mean(e_data)

        sampler = make_noise_sampler(model, n_noise, max_len, pi,
                                     greedy_sampling)
        ntok, ntar, nlen, log_q_new = jax.lax.stop_gradient(
            sampler(params, rng))
        e_noise = energy_of(params, ntok, ntar, nlen)
        log_p_new = jax.lax.stop_gradient(
            -e_noise - jnp.take(log_pi * 0.0, 0))  # -E (unnormalized)

        metrics = {}
        if method == "is":
            log_w = log_p_new - log_q_new
            w = jax.lax.stop_gradient(jax.nn.softmax(log_w))
            loss_sampling = jnp.sum(w * e_noise)
            new_chain = chain
            ess = 1.0 / jnp.sum(w * w) / n_noise
            metrics["is_ess"] = ess
        elif method == "mis":
            if chain is None:
                chain = (ntok, ntar, nlen,
                         jax.lax.stop_gradient(log_p_new), log_q_new)
            ctok, ctar, clen, c_logp, c_logq = chain
            # refresh the chain's p under CURRENT params (the target
            # distribution moves every step)
            c_logp = jax.lax.stop_gradient(
                -energy_of(params, ctok, ctar, clen))
            log_acc = (log_p_new - log_q_new) - (c_logp - c_logq)
            u = jax.random.uniform(jax.random.fold_in(rng, 7),
                                   (n_noise,))
            acc = (jnp.log(jnp.maximum(u, 1e-30))
                   < jnp.minimum(log_acc, 0.0))
            sel = lambda new, old: jnp.where(
                acc.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
            ntok2 = sel(ntok, ctok)
            ntar2 = sel(ntar, ctar)
            nlen2 = jnp.where(acc, nlen, clen)
            e_chain = energy_of(params, ntok2, ntar2, nlen2)
            loss_sampling = jnp.mean(e_chain)
            new_chain = (ntok2, ntar2, nlen2,
                         jax.lax.stop_gradient(-e_chain),
                         jnp.where(acc, log_q_new, c_logq))
            metrics["accept_rate"] = jnp.mean(acc.astype(jnp.float32))
        else:
            raise ValueError(method)

        loss = loss_data - loss_sampling
        if update_q:
            # proposal ML on data (KL(p_d || q) minimization)
            q_ml = -jnp.mean(q_logp(params, tokens, targets, lengths)
                             / jnp.maximum(lengths, 1))
            loss = loss + q_ml
            metrics["loss_q_ml"] = q_ml
        metrics.update(loss_data=loss_data, loss_sampling=loss_sampling,
                       energy_data=jnp.mean(e_data),
                       energy_noise=jnp.mean(e_noise))
        return loss, (metrics, new_chain)

    return loss_fn


def mh_within_gibbs_sweep(model: TRFNCE, params, rng, tokens, targets,
                          lengths, num_positions: int = 1):
    """One MH-within-Gibbs sweep (model.py:996-1060): pick
    `num_positions` random valid positions per sequence; at each,
    propose a new token from the noise LM's full-sequence conditional
    and accept by the energy ratio. Returns updated (tokens, targets,
    accept_rate). All shapes static; jit-able."""

    def energy_of(tok, tar):
        return model.apply({"params": params}, tok, tar, lengths,
                           method=model.energy)

    B, U = tokens.shape

    def one_position(carry, key):
        tokens, targets, n_acc = carry
        k_pos, k_tok, k_u = jax.random.split(key, 3)
        # position in [1, len-1] (keep BOS fixed)
        pos = 1 + (jax.random.uniform(k_pos, (B,))
                   * jnp.maximum(lengths - 1, 1)).astype(jnp.int32)
        pos = jnp.clip(pos, 1, U - 1)
        # proposal: noise LM logits at the predicting position
        logits, _ = model.apply(
            {"params": params}, tokens, lengths,
            method=lambda m, t, l: m.noise_model(t, l,
                                                 deterministic=True))
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        V = lp.shape[-1]
        idx = jnp.broadcast_to((pos - 1)[:, None, None], (B, 1, V))
        row = jnp.take_along_axis(lp, idx, axis=1)[:, 0]   # (B, V)
        prop = jax.random.categorical(k_tok, row)      # (B,)
        old = jnp.take_along_axis(tokens, pos[:, None], 1)[:, 0]
        new_tokens = jnp.asarray(tokens).at[
            jnp.arange(B), pos].set(prop)
        new_targets = jnp.asarray(targets).at[
            jnp.arange(B), pos - 1].set(prop)
        e_old = energy_of(tokens, targets)
        e_new = energy_of(new_tokens, new_targets)
        q_old = jnp.take_along_axis(row, old[:, None], 1)[:, 0]
        q_new = jnp.take_along_axis(row, prop[:, None], 1)[:, 0]
        log_acc = (-e_new + q_old) - (-e_old + q_new)
        u = jax.random.uniform(k_u, (B,))
        acc = jnp.log(jnp.maximum(u, 1e-30)) < jnp.minimum(log_acc, 0.0)
        tokens = jnp.where(acc[:, None], new_tokens, tokens)
        targets = jnp.where(acc[:, None], new_targets, targets)
        return (tokens, targets,
                n_acc + jnp.mean(acc.astype(jnp.float32))), None

    keys = jax.random.split(rng, num_positions)
    (tokens, targets, n_acc), _ = jax.lax.scan(
        one_position, (tokens, targets, jnp.float32(0.0)), keys)
    return tokens, targets, n_acc / num_positions
