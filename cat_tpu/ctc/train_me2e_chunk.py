"""Chunk-based multichannel E2E (ME2E-CUSIDE) CTC task.

Counterpart of /root/reference/cat/ctc/train_me2e_chunk.py
(UnifiedAMTrainer:29-460 — the me2e variant of CUSIDE: chunked STFT
windows with left/right context, per-chunk beamforming, optional
fbank-level SimuNet future simulation, encoder over windows, middle
extraction) driven by the reference's manager_wo (chunk loss +
NaN-guard).

TPU design mirrors ctc/streaming.py: windows are ONE batched gather
over the STFT time axis, the beamformer and encoder see (N·C, win, ·)
batches, and everything stays a single jitted program with static
chunk geometry (no per-chunk python loop, train_me2e_chunk.py:64-160's
index shuffling becomes the make_chunks index grid).

Batches carry raw multichannel waveforms (feats = (N, Ch, L) float32)
like ctc/train_me2e.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from cat_tpu import models
from cat_tpu.ctc.streaming import SimuNet, make_chunks
from cat_tpu.front.beamformer import BeamformerNet
from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.utils.manager import TrainState


class ChunkMe2eModel(nn.Module):
    """Beamformer + encoder with chunked (streaming) operation.

    chunk/left/right are in STFT frames (train_me2e_chunk.py
    chunk_size / context_size_left / context_size_right)."""

    frontend: BeamformerNet
    encoder: nn.Module
    simu: Optional[nn.Module] = None   # fbank-level future simulator
    chunk: int = 64
    left: int = 64
    right: int = 16

    def full_forward(self, wave, wave_lengths, deterministic=True):
        feats, flens = self.frontend(wave, wave_lengths,
                                     deterministic=deterministic)
        return self.encoder(feats, flens, deterministic=deterministic)

    def __call__(self, wave, wave_lengths, deterministic=True):
        return self.full_forward(wave, wave_lengths, deterministic)

    def chunk_forward(self, wave, wave_lengths, deterministic=True,
                      future="simu"):
        """Chunked beamform + encode (bf_chunk_infer geometry).

        future: 'simu' (SimuNet fbank prediction), 'none' (zero right
        context), 'real' (true right context — training-only oracle).
        Returns (logits (N, T', V), out_lengths, simu_l1).
        """
        spec, flens = self.frontend.spectrum(wave, wave_lengths)
        N, Ch, T, F = spec.shape
        # window the STFT time axis with context: complex spec flows
        # through make_chunks as a flat (N, T, Ch*F) feature array
        flat = jnp.transpose(spec, (0, 2, 1, 3)).reshape(N, T, Ch * F)
        use_right = 0 if future == "simu" else self.right
        windows, C = make_chunks(flat, self.chunk, self.left,
                                 self.right)
        if future != "real":
            # zero the real right context at the spectrum level
            windows = windows.at[:, :, self.left + self.chunk:, :].set(0)
        win = self.left + self.chunk + self.right
        wspec = windows.reshape(N * C, win, Ch, F)
        wspec = jnp.transpose(wspec, (0, 2, 1, 3))     # (N·C, Ch, w, F)
        wlens = jnp.full((N * C,), self.left + self.chunk + use_right,
                         jnp.int32)
        feats = self.frontend.enhance(wspec, wlens,
                                      deterministic=deterministic)[0]
        # feats (N·C, win, B)
        simu_l1 = jnp.float32(0.0)
        if future == "simu" and self.simu is not None:
            chunks_only = feats[:, self.left:self.left + self.chunk]
            pred = self.simu(chunks_only)              # (N·C, right, B)
            # regression target: the NEXT chunk's first `right` fbank
            # frames (train_me2e_chunk.py:168-190), i.e. this window's
            # region beyond the chunk — recompute from the real spec
            real_next = make_chunks(flat, self.chunk, 0, self.right)[0]
            real_next = real_next[:, :, self.chunk:, :].reshape(
                N * C, self.right, Ch, F)
            rspec = jnp.transpose(real_next, (0, 2, 1, 3))
            rfeats = self.frontend.enhance(
                rspec, jnp.full((N * C,), self.right, jnp.int32),
                deterministic=True)[0]
            simu_l1 = jnp.mean(jnp.abs(
                pred - jax.lax.stop_gradient(rfeats)))
            feats = feats.at[:, self.left + self.chunk:].set(
                jax.lax.stop_gradient(pred))
        enc, _ = self.encoder(
            feats, jnp.full((N * C,), win, jnp.int32),
            deterministic=deterministic)
        enc_T = enc.shape[1]
        r = max(win // max(enc_T, 1), 1)
        lo = self.left // r
        width = self.chunk // r
        mid = enc[:, lo:lo + width]
        V = mid.shape[-1]
        out = mid.reshape(N, C * width, V)
        out_lengths = jnp.minimum(-(-flens // r),
                                  C * width).astype(jnp.int32)
        return out, out_lengths, simu_l1


def build_model(cfg: dict, num_classes: int) -> ChunkMe2eModel:
    f_kw = dict(cfg.get("frontend", {}).get("kwargs", {}))
    frontend = BeamformerNet(**f_kw)
    enc_cfg = cfg["encoder"]
    e_kw = dict(enc_cfg.get("kwargs", {}))
    e_kw["num_classes"] = num_classes
    encoder = models.get_encoder(enc_cfg["type"])(**e_kw)
    ucfg = cfg.get("unified", {})
    chunk = ucfg.get("chunk", 64)
    right = ucfg.get("right_context", 16)
    simu = SimuNet(feat_dim=f_kw.get("num_bins", 80),
                   hidden=ucfg.get("simu_hidden", 128), right=right)
    return ChunkMe2eModel(frontend=frontend, encoder=encoder, simu=simu,
                          chunk=chunk,
                          left=ucfg.get("left_context", chunk),
                          right=right)


def init_state(model, tx, num_channels=4, rng=None,
               num_samples=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if num_samples is None:
        # at least two chunks of frames
        num_samples = (2 * model.chunk + 2) * \
            model.frontend.frame_shift + model.frontend.frame_length
    wave = jnp.zeros((2, num_channels, num_samples), jnp.float32)
    lens = jnp.asarray([num_samples] * 2, jnp.int32)
    k1, k2 = jax.random.split(rng)
    v_full = jax.jit(lambda k: model.init(
        k, wave, lens, method=model.full_forward))(k1)
    v_chunk = jax.jit(lambda k: model.init(
        k, wave, lens, method=model.chunk_forward))(k2)
    params = dict(v_chunk["params"])
    for k, v in v_full["params"].items():
        params.setdefault(k, v)
    return TrainState(params=params,
                      batch_stats=v_chunk.get("batch_stats", {}),
                      opt_state=tx.init(params), step=jnp.asarray(0))


def make_loss_fn(model: ChunkMe2eModel, lamb_chunk=0.5, lamb_simu=1.0,
                 future="simu", channels_last=False):
    """(1−λ)·CTC(full) + λ·CTC(chunk) + λ_simu·L1 — the manager_wo
    joint objective (forward returns utt_loss + chunk_loss,
    manager_wo.py:78-95). channels_last: batch wave is (N, L, C)."""

    def loss_fn(params, batch_stats, batch, rng, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        rngs = {"dropout": rng} if train else {}
        wave, wlens = batch["feats"], batch["feat_lengths"]
        if channels_last:
            wave = jnp.swapaxes(wave, 1, 2)

        def run(method, **kw):
            out = model.apply(variables, wave, wlens,
                              deterministic=not train, mutable=mutable,
                              rngs=rngs, method=method, **kw)
            return out if mutable else (out, {})

        (full_logits, full_lens), vars1 = run(model.full_forward)
        (chunk_out, chunk_lens, simu_l1), vars2 = run(
            model.chunk_forward, future=future)
        stats = (vars2 or vars1).get("batch_stats", batch_stats) \
            if mutable else batch_stats

        lp_full = jax.nn.log_softmax(
            full_logits.astype(jnp.float32), -1)
        lp_chunk = jax.nn.log_softmax(
            chunk_out.astype(jnp.float32), -1)
        labels, llens = batch["labels"], batch["label_lengths"]
        nll_full = ctc_loss(lp_full, labels, full_lens, llens,
                            reduction="none")
        nll_chunk = ctc_loss(lp_chunk, labels, chunk_lens, llens,
                             reduction="none")
        per_seq = ((1.0 - lamb_chunk) * nll_full
                   + lamb_chunk * nll_chunk)
        w = batch["weight"]
        loss = (jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)
                + lamb_simu * simu_l1)
        return loss, (stats, per_seq, nll_full, nll_chunk, simu_l1)

    return loss_fn


def make_train_step(model, tx, grad_clip=5.0, lamb_chunk=0.5,
                    lamb_simu=1.0, future="simu", channels_last=False,
                    **_unused):
    from cat_tpu.ctc.train import set_lr

    loss_fn = make_loss_fn(model, lamb_chunk, lamb_simu, future,
                           channels_last)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (stats, _, nll_f, nll_c, simu_l1)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng, True)
        # manager_wo NaN/Inf guard (manager_wo.py:635-638)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        scale = jnp.where(finite,
                          jnp.minimum(1.0, grad_clip / (gnorm + 1e-6)),
                          0.0)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g * scale, 0.0), grads)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=stats,
                              opt_state=opt_state, step=state.step + 1),
                {"loss": loss, "grad_norm": gnorm,
                 "utt_loss": jnp.mean(nll_f),
                 "chunk_loss": jnp.mean(nll_c), "simu_l1": simu_l1,
                 "skipped": 1.0 - finite.astype(jnp.float32)})

    return train_step


def make_eval_step(model, lamb_chunk=0.5, future="simu",
                   channels_last=False, **_unused):
    loss_fn = make_loss_fn(model, lamb_chunk, 0.0, future, channels_last)

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (_, per_seq, _, _, _) = loss_fn(
            state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), False)
        w = batch["weight"]
        return {"loss_sum": jnp.sum(per_seq * w), "count": jnp.sum(w)}

    return eval_step


def bf_chunk_infer(model: ChunkMe2eModel, variables, wave, wave_lengths,
                   future="simu"):
    """Streaming ME2E inference (train_me2e_chunk.py:64-229): chunked
    beamform + encode, returns (logits, out_lengths)."""
    out, out_lens, _ = model.apply(variables, wave, wave_lengths,
                                   deterministic=True,
                                   method=model.chunk_forward,
                                   future=future)
    return out, out_lens
