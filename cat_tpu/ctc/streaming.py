"""CUSIDE-style streaming: chunked encoding with simulated future context.

Counterpart of /root/reference/cat/ctc/train_unified.py: UnifiedAMTrainer
(:27-290 — joint streaming + non-streaming loss, chunk_forward with
stochastic future context {simulated, none, real}, chunk_infer) and
cat/shared/simu_net.py:63-137 (SimuNet GRU future-frame simulator with
L1 loss).

TPU design: chunks are materialized as a batched window gather
(N, num_chunks, lc + chunk + rc, F) and encoded as ONE big batch —
no per-chunk python loop; the whole unified train step stays a single
jitted program with static chunk geometry.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from cat_tpu.ops.ctc import ctc_loss


def make_chunks(feats, chunk: int, left: int, right: int):
    """(N, T, F) → windows (N, C, left+chunk+right, F), zero-padded OOB.

    C = ceil(T / chunk). Gathered with a static index grid (one XLA
    gather), matching chunk_forward's unfold (train_unified.py:59-140).
    """
    N, T, F = feats.shape
    C = -(-T // chunk)
    Tpad = C * chunk
    win = left + chunk + right
    starts = jnp.arange(C) * chunk - left          # (C,)
    offs = jnp.arange(win)                          # (win,)
    idx = starts[:, None] + offs[None, :]           # (C, win)
    valid = (idx >= 0) & (idx < T)
    idx_c = jnp.clip(idx, 0, T - 1)
    g = feats[:, idx_c, :]                          # (N, C, win, F)
    return jnp.where(valid[None, :, :, None], g, 0.0), C


class SimuNet(nn.Module):
    """GRU future-frame simulator (simu_net.py:63-137): consumes a chunk,
    predicts the next `right` frames."""

    feat_dim: int
    hidden: int = 256
    right: int = 16

    @nn.compact
    def __call__(self, chunk_feats):
        """(B, chunk, F) → predicted (B, right, F)."""
        h = nn.RNN(nn.GRUCell(self.hidden))(chunk_feats)
        last = h[:, -1]                              # (B, H)
        out = nn.Dense(self.right * self.feat_dim)(last)
        return out.reshape((-1, self.right, self.feat_dim))


class UnifiedEncoder(nn.Module):
    """Wraps an encoder for joint full-context + chunked operation."""

    encoder: nn.Module
    simu: Optional[nn.Module] = None
    chunk: int = 64
    left: int = 64
    right: int = 16

    def full_forward(self, feats, lengths, deterministic=True):
        return self.encoder(feats, lengths, deterministic=deterministic)

    def chunk_forward(self, feats, lengths, deterministic=True,
                      future="simu"):
        """Chunked encoding. future: 'simu' | 'none' | 'real'.

        Returns (logits (N, T', V), out_lengths, simu_l1) where T' is the
        concatenation of per-chunk subsampled outputs and simu_l1 is the
        simulator regression loss (0 when future != 'simu').
        """
        N, T, F = feats.shape
        windows, C = make_chunks(feats, self.chunk, self.left, self.right)
        win = self.left + self.chunk + self.right
        simu_l1 = jnp.float32(0.0)
        if future == "none":
            windows = windows.at[:, :, self.left + self.chunk:, :].set(0.0)
        elif future == "simu" and self.simu is not None:
            chunks_only = windows[:, :, self.left:self.left + self.chunk]
            flat = chunks_only.reshape((N * C, self.chunk, F))
            pred = self.simu(flat)                     # (N*C, right, F)
            real = windows[:, :, self.left + self.chunk:, :].reshape(
                (N * C, self.right, F))
            simu_l1 = jnp.mean(jnp.abs(pred - real))
            # encoder consumes simulated future; gradient to the encoder
            # only (simulator trained by its own L1, as in CUSIDE)
            windows = windows.at[:, :, self.left + self.chunk:, :].set(
                jax.lax.stop_gradient(pred).reshape(
                    (N, C, self.right, F)))
        flat = windows.reshape((N * C, win, F))
        flat_lens = jnp.full((N * C,), win, jnp.int32)
        enc, enc_lens = self.encoder(flat, flat_lens,
                                     deterministic=deterministic)
        # keep only the middle (chunk) region of each window's outputs.
        # subsampling ratio r = win / enc_T (static).
        enc_T = enc.shape[1]
        r = win // enc_T if enc_T else 1
        lo = self.left // max(r, 1)
        width = self.chunk // max(r, 1)
        mid = enc[:, lo:lo + width]                  # (N*C, w, V)
        V = mid.shape[-1]
        out = mid.reshape((N, C * width, V))
        out_lengths = jnp.minimum(
            -(-lengths // max(r, 1)), C * width).astype(jnp.int32)
        return out, out_lengths, simu_l1


def make_unified_loss_fn(model: UnifiedEncoder, lamb_chunk=0.5,
                         lamb_simu=1.0, future="simu"):
    """Joint loss: (1-λ)·CTC(full) + λ·CTC(chunk) + λ_simu·L1
    (train_unified.py joint objective)."""

    def loss_fn(params, batch_stats, batch, rng, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        feats = batch["feats"]
        flens = batch["feat_lengths"]
        rngs = {"dropout": rng} if train else {}
        mutable = ["batch_stats"] if (train and batch_stats) else False

        def run(method, **kw):
            out = model.apply(variables, feats, flens,
                              deterministic=not train, mutable=mutable,
                              rngs=rngs, method=method, **kw)
            if mutable:
                return out
            return out, {}

        (full_logits, full_lens), vars1 = run(model.full_forward)
        (chunk_logits, chunk_lens, simu_l1), vars2 = run(
            model.chunk_forward, future=future)
        new_stats = (vars2 or vars1).get("batch_stats", batch_stats) \
            if mutable else batch_stats

        labels = batch["labels"]
        llens = batch["label_lengths"]
        w = batch["weight"]

        def wmean(per_seq):
            return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)

        lp_full = jax.nn.log_softmax(
            full_logits.astype(jnp.float32), axis=-1)
        lp_chunk = jax.nn.log_softmax(
            chunk_logits.astype(jnp.float32), axis=-1)
        loss_full = wmean(ctc_loss(lp_full, labels, full_lens, llens,
                                   reduction="none"))
        loss_chunk = wmean(ctc_loss(lp_chunk, labels, chunk_lens, llens,
                                    reduction="none"))
        loss = ((1 - lamb_chunk) * loss_full
                + lamb_chunk * loss_chunk + lamb_simu * simu_l1)
        return loss, (new_stats, loss_full, loss_chunk, simu_l1)

    return loss_fn


def chunk_infer(model: UnifiedEncoder, variables, feats, lengths,
                future="simu"):
    """Fixed-chunk streaming inference (train_unified.py chunk_infer)."""
    out, out_lens, _ = model.apply(variables, feats, lengths,
                                   deterministic=True,
                                   method=model.chunk_forward,
                                   future=future)
    return out, out_lens
