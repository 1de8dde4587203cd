"""RNN-T joint networks.

Counterparts of /root/reference/cat/rnnt/joiner.py: AbsJointNet (:19-102),
JointNet add/cat (:32-164), HAT (:166-210), LogAdd "simple" joiner (:212+).
The reference's compact-layout gather ops (gather.cat/gather.sum CUDA) are
unnecessary here: the dense (N, T, U, V) product is only materialized
lazily inside jit, and the fused "simple" path never materializes it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class JointNet(nn.Module):
    """fc(enc) ⊕ fc(pred) → act → fc → V (joiner.py:32-164)."""

    odim: int  # vocabulary size
    hdim: int = 512
    join_mode: str = "add"  # or "cat"
    act: str = "tanh"

    @nn.compact
    def __call__(self, enc, pred):
        """enc (N, T, De), pred (N, U1, Dp) → logits (N, T, U1, V).

        Also accepts pre-broadcast inputs of equal rank for decode steps:
        enc (N, De), pred (N, Dp) → (N, V)."""
        actfn = {"tanh": jnp.tanh, "relu": jax.nn.relu}[self.act]
        if self.join_mode == "add":
            e = nn.Dense(self.hdim, name="fc_enc")(enc)
            p = nn.Dense(self.hdim, name="fc_pred")(pred)
            if e.ndim == 3:
                h = e[:, :, None, :] + p[:, None, :, :]
            else:
                h = e + p
            h = actfn(h)
        elif self.join_mode == "cat":
            if enc.ndim == 3:
                T, U1 = enc.shape[1], pred.shape[1]
                e = jnp.broadcast_to(enc[:, :, None, :],
                                     (enc.shape[0], T, U1, enc.shape[-1]))
                p = jnp.broadcast_to(pred[:, None, :, :],
                                     (pred.shape[0], T, U1, pred.shape[-1]))
                h = jnp.concatenate([e, p], axis=-1)
            else:
                h = jnp.concatenate([enc, pred], axis=-1)
            h = actfn(nn.Dense(self.hdim, name="fc_cat")(h))
        else:
            raise ValueError(self.join_mode)
        return nn.Dense(self.odim, name="fc_out")(h)


class HAT(nn.Module):
    """Hybrid autoregressive transducer joiner (joiner.py:166-210):
    bernoulli blank gate + label softmax, enabling internal-LM
    estimation. Returns log-probs directly."""

    odim: int
    hdim: int = 512

    @nn.compact
    def __call__(self, enc, pred):
        e = nn.Dense(self.hdim, name="fc_enc")(enc)
        p = nn.Dense(self.hdim, name="fc_pred")(pred)
        if e.ndim == 3:
            h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
        else:
            h = jnp.tanh(e + p)
        logits = nn.Dense(self.odim, name="fc_out")(h)
        blank_logit = logits[..., :1]
        log_pb = jax.nn.log_sigmoid(blank_logit)          # log p(blank)
        log_pnb = jax.nn.log_sigmoid(-blank_logit)        # log 1-p(blank)
        label_logp = jax.nn.log_softmax(logits[..., 1:], axis=-1)
        return jnp.concatenate([log_pb, log_pnb + label_logp], axis=-1)

    def ilm_logp(self, pred):
        """Internal LM estimate: joiner with zero encoder contribution
        (used for ILM subtraction at decode, decoder.py:660-702)."""
        p = nn.Dense(self.hdim, name="fc_pred")(pred)
        h = jnp.tanh(p)
        logits = nn.Dense(self.odim, name="fc_out")(h)
        return jax.nn.log_softmax(logits[..., 1:], axis=-1)


class LogAdd(nn.Module):
    """'Simple' logit-free joiner: separate V-dim projections summed in
    the loss (joiner.py:212-235, warp_rnnt rnnt_loss_simple path).

    Training inputs (N,T,De)/(N,U1,Dp) return the two factors (f, g);
    the fused loss (ops.rnnt_simple) combines them without materializing
    a (N,T,U,V) tensor. Decode-step inputs (N,De)/(N,Dp) return
    log_softmax(f+g) — already normalized, matching the reference's
    inference mode (joiner.py:230-235); decoders must therefore treat a
    LogAdd joiner as joiner_normalized."""

    odim: int

    @nn.compact
    def __call__(self, enc, pred):
        e = nn.Dense(self.odim, name="fc_enc")(enc)
        p = nn.Dense(self.odim, name="fc_pred")(pred)
        if e.ndim <= 2:
            return jax.nn.log_softmax(e + p, axis=-1)
        return e, p
