"""NN building blocks (flax.linen), length-mask aware, static shapes.

TPU-native counterparts of /root/reference/cat/shared/layer.py:
Conv2dSubsampling (:77-144), VGG2LSubsampling (:155-203),
PositionalEncoding (:212-226), RelPositionMultiHeadAttention (:238-416),
conformer FFModule/ConvModule/MHSAModule/ConformerCell (:424-573),
TimeReduction (:703-718). Design differences from the reference:
- every module takes (x, lengths) and masks internally — no packed
  sequences (cuDNN) — so the whole stack jits with static shapes;
- the rel-shift is a verified gather (XLA lowers it well) instead of the
  view/stride trick;
- batch statistics in ConvModule use masked means under SPMD jit, so
  cross-replica "sync BN" falls out of GSPMD for free (no wrapper like
  coreutils.py:389-393).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def length_mask(lengths, T):
    """(N,) lengths → (N, T) bool mask."""
    return jnp.arange(T)[None, :] < lengths[:, None]


class Dropout(nn.Module):
    """Dropout that dispatches to the fused Pallas kernel (default ON on
    TPU via the "fused_dropout" perf flag; =interpret runs the kernel in
    interpreter mode off-TPU). The fused path generates the mask with
    the core's hardware PRNG inside one pass over the tensor and
    regenerates it in the backward pass — no stored mask, no extra HBM
    round-trip (see ops/dropout_pallas.py)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        if deterministic or self.rate <= 0.0:
            return x
        from cat_tpu.utils.flags import resolve
        mode = resolve("fused_dropout")
        if mode not in ("1", "interpret"):
            return nn.Dropout(self.rate)(x, deterministic=False)
        from cat_tpu.ops.dropout_pallas import fused_dropout, key_to_seed
        seed = key_to_seed(self.make_rng("dropout"))
        return fused_dropout(x, seed, self.rate, mode == "interpret")


class Conv2dSubsampling(nn.Module):
    """Two stride-2 conv2d blocks: T → T//4 (and freq //4), then linear.

    `dtype` runs the convs in bf16: the Conv_0 activation is the single
    largest tensor of a training step ((N, T/2, F/2, odim) — 7.6 GB at
    batch 128 flagship in f32), so compute dtype here directly bounds
    the model's max batch."""

    odim: int
    norm: bool = False  # causal variants omitted; see CausalConv2d below
    dtype: Any = jnp.float32
    # process the convs in overlapping time chunks of this many OUTPUT
    # frames (0 = whole utterance at once). The conv transient is the
    # largest tensor of a train step even in bf16 (9.5 GB at batch 320
    # flagship); chunking bounds it to ~chunk/T of that.
    time_chunk: int = 0

    def _stack(self, h):
        """The two VALID stride-2 convs + projection. (N,Ti,F,1)→(N,To,D)."""
        h = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv_a")(h)
        h = nn.relu(h)
        h = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv_b")(h)
        h = nn.relu(h)
        # conv_b is ~3.4 TFLOP at the flagship shape (3x3 x odim x odim
        # at T/4 x F/4) — under full remat it is recomputed in the
        # backward pass. Naming its (much smaller than conv_a's) output
        # lets the encoder remat it with a save-this-name policy:
        # recompute only the cheap 1-input-channel conv_a.
        from jax.ad_checkpoint import checkpoint_name
        h = checkpoint_name(h, "sub_conv_b")
        # contract the (freq, channel) dims directly: flattening first
        # forces a full relayout copy of the (N, T', F/4, D) conv
        # output before the projection dot (~49 ms/step of %copy at
        # the flagship shape, round-5 trace)
        return nn.DenseGeneral(self.odim, axis=(-2, -1),
                               dtype=self.dtype, name="proj")(h)

    @nn.compact
    def __call__(self, x, lengths):
        # x: (N, T, F)
        N, T, F = x.shape
        h = x[:, :, :, None].astype(self.dtype)  # NHWC: (N, T, F, 1)
        Oc = self.time_chunk
        if Oc <= 0 or T <= 4 * Oc + 3:
            out = self._stack(h)
        else:
            # output row k consumes input rows [4k, 4k+7); chunk of Oc
            # output rows ⇒ input slice of 4·Oc+3 rows starting at 4k0
            T2 = ((T - 3) // 2 + 1 - 3) // 2 + 1
            K = -(-T2 // Oc)
            Ic = 4 * Oc + 3
            pad_to = 4 * (K - 1) * Oc + Ic
            hp = jnp.pad(h, ((0, 0), (0, max(0, pad_to - T)),
                             (0, 0), (0, 0)))
            chunks = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(hp, 4 * k * Oc, Ic, 1)
                 for k in range(K)])          # (K, N, Ic, F, 1)

            def body(mdl, carry, xc):
                return carry, mdl._stack(xc)

            # remat the body: without it the scan stacks every chunk's
            # conv intermediates for the backward pass, recreating the
            # full-size transient this chunking exists to avoid
            body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=0, out_axes=0)
            _, outs = scan(self, None, chunks)  # (K, N, Oc, D)
            out = jnp.transpose(outs, (1, 0, 2, 3)).reshape(N, K * Oc, -1)
            out = out[:, :T2]
        # length math for two VALID stride-2 convs with kernel 3
        out_lengths = (lengths - 1) // 2
        out_lengths = (out_lengths - 1) // 2
        out_lengths = jnp.maximum(out_lengths, 1)
        return out, out_lengths


class VGG2LSubsampling(nn.Module):
    """VGG-style 2x(conv,conv,maxpool) 1/4 subsampling (layer.py:155-203)."""

    out_channel: int = 128

    @nn.compact
    def __call__(self, x, lengths):
        N, T, F = x.shape
        h = x[:, :, :, None]
        for ch in (self.out_channel // 2, self.out_channel):
            h = nn.Conv(ch, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        Tp = h.shape[1]
        h = h.reshape(N, Tp, -1)
        out_lengths = jnp.maximum(lengths // 4, 1)
        return h, out_lengths


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal PE (layer.py:212-226)."""

    d_model: int
    max_len: int = 5000

    def __call__(self, x):
        T = x.shape[1]
        pos = np.arange(self.max_len)[:, None]
        div = np.exp(np.arange(0, self.d_model, 2)
                     * (-np.log(10000.0) / self.d_model))
        pe = np.zeros((self.max_len, self.d_model), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        return x + jnp.asarray(pe)[None, :T]


def rel_positional_encoding(T, d_model, dtype=jnp.float32):
    """Relative sinusoid table p[m], m∈[0, 2T-1), distance d = T-1-m."""
    d = np.arange(T - 1, -T, -1)[:, None].astype(np.float64)  # (2T-1, 1)
    div = np.exp(np.arange(0, d_model, 2)
                 * (-np.log(10000.0) / d_model))
    pe = np.zeros((2 * T - 1, d_model), np.float64)
    pe[:, 0::2] = np.sin(d * div)
    pe[:, 1::2] = np.cos(d * div)
    return jnp.asarray(pe, dtype)


def rel_shift_gather(bd):
    """(N, H, T, 2T-1) → (N, H, T, T): out[t, j] = bd[t, T-1-t+j].

    Implemented with the pad-reshape trick (pure layout ops) — TPU
    lowers large gathers pathologically, so no take_along_axis here.
    """
    N, H, T, M = bd.shape  # M = 2T - 1
    x = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (N,H,T,2T)
    x = x.reshape(N, H, 2 * T, T)
    x = x[:, :, 1:, :]                                  # (N,H,2T-1,T)
    x = x.reshape(N, H, T, 2 * T - 1)
    return x[..., :T]


class RelPositionMultiHeadAttention(nn.Module):
    """Transformer-XL style relative-position MHSA (layer.py:238-416)."""

    num_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    # attention context window (left, right) in frames; -1 = unlimited.
    # (right=0 → causal; both bounded → streaming-chunk friendly)
    context: tuple = (-1, -1)

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        N, T, D = x.shape
        H = self.num_heads
        Dh = D // H
        dense = lambda name: nn.DenseGeneral((H, Dh), use_bias=True,
                                             dtype=self.dtype, name=name)
        xc = x.astype(self.dtype)
        q = dense("q")(xc)
        k = dense("k")(xc)
        v = dense("v")(xc)
        pos_dense = nn.DenseGeneral((H, Dh), use_bias=False,
                                    dtype=self.dtype, name="pos")

        u_bias = self.param("u_bias", nn.initializers.zeros, (H, Dh))
        v_bias = self.param("v_bias", nn.initializers.zeros, (H, Dh))
        u_bias = u_bias.astype(self.dtype)
        v_bias = v_bias.astype(self.dtype)
        from cat_tpu.utils.flags import resolve
        flash = resolve("flash_attn")
        # multi-chip: only the packed decomp kernel carries a
        # custom_partitioning rule (ops/partitioning.py); the older
        # layouts would make GSPMD all-gather activations around the
        # opaque pallas_call, so gate those off under a mesh
        # (CAT_TPU_FLASH_ATTN=force to override).
        packed_ok = (resolve("flash_attn_packed") in ("1", "interpret")
                     and resolve("flash_attn_decomp")
                     in ("1", "interpret") and T <= 512)
        if flash == "1" and jax.device_count() > 1 and not packed_ok:
            flash = ""
        if flash == "force":
            flash = "1"
        if flash in ("1", "interpret") and self.context == (-1, -1):
            # fused Pallas path: scores/softmax/dropout/value contraction
            # all in VMEM tiles — no (N, H, T, ~T) tensor ever reaches
            # HBM (ops/attention_pallas.py)
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = None
            if rate > 0.0:
                from cat_tpu.ops.dropout_pallas import key_to_seed
                seed = key_to_seed(self.make_rng("dropout"))
            decomp_flag = resolve("flash_attn_decomp")
            decomp = decomp_flag in ("1", "interpret") and T <= 512
            packed_flag = resolve("flash_attn_packed")
            if (decomp and packed_flag in ("1", "interpret")):
                # packed-layout variant: q/k/v stay in the projection's
                # (N, T, H·Dh) layout (reshape is free) — no transpose
                # or relayout around the kernel (~36 ms/step of
                # pad+transpose fusions at the flagship shape); heads
                # loop inside the kernel over lane slices
                from jax.ad_checkpoint import checkpoint_name
                from cat_tpu.ops.attention_pallas import (
                    flash_relpos_attention_band,
                    flash_relpos_attention_packed)
                w = pos_dense(jnp.eye(D, dtype=self.dtype))
                band_flag = resolve("flash_attn_band")
                interp = (packed_flag == "interpret"
                          or decomp_flag == "interpret"
                          or flash == "interpret"
                          or band_flag == "interpret")
                # band variant: minimal-rank rel-pos scores (chunked
                # projected table) instead of the D-wide decomp
                # matmuls — see ops/attention_pallas.py band section
                kern = (flash_relpos_attention_band
                        if band_flag in ("1", "interpret")
                        else flash_relpos_attention_packed)
                out = kern(
                    q.reshape(N, T, D), k.reshape(N, T, D),
                    v.reshape(N, T, D), w, u_bias, v_bias, mask,
                    scale=1.0 / float(np.sqrt(Dh)), dropout_rate=rate,
                    seed=seed, interpret=interp)
                out = checkpoint_name(out, "flash_attn")
                out = jnp.where(mask[:, :, None], out,
                                jnp.zeros((), out.dtype))
                out = nn.DenseGeneral(
                    D, axis=(-2, -1), dtype=self.dtype,
                    name="out")(out.reshape(N, T, H, Dh)
                                .astype(self.dtype))
                return out.astype(x.dtype)
            if decomp:
                # shear-free variant: fold the sinusoid basis into trig
                # tables so rel-pos scores become one MXU matmul (the
                # kernel consumes the "pos" projection kernel directly;
                # dense(eye) == its kernel, keeping the param structure
                # identical across paths)
                from cat_tpu.ops.attention_pallas import \
                    flash_relpos_attention_decomp
                w = pos_dense(jnp.eye(D, dtype=self.dtype))  # (D, H, Dh)
                out = flash_relpos_attention_decomp(
                    q, k, v, w, u_bias, v_bias, mask,
                    scale=1.0 / float(np.sqrt(Dh)), dropout_rate=rate,
                    seed=seed,
                    interpret=(decomp_flag == "interpret"
                               or flash == "interpret"))
            else:
                from cat_tpu.ops.attention_pallas import \
                    flash_relpos_attention
                p = pos_dense(
                    rel_positional_encoding(T, D, self.dtype))
                out = flash_relpos_attention(
                    q, k, v, p, u_bias, v_bias, mask,
                    scale=1.0 / float(np.sqrt(Dh)), dropout_rate=rate,
                    seed=seed, interpret=(flash == "interpret"))
            # under remat, save the kernel output instead of re-running
            # the fused forward in the backward pass (the encoders'
            # dots_noexpand policy also saves this name): ~11 ms/cell
            # of recompute avoided at the flagship shape
            from jax.ad_checkpoint import checkpoint_name
            out = checkpoint_name(out, "flash_attn")
            out = jnp.where(mask[:, :, None, None], out,
                            jnp.zeros((), out.dtype))
            out = nn.DenseGeneral(D, axis=(-2, -1), dtype=self.dtype,
                                  name="out")(out.astype(self.dtype))
            return out.astype(x.dtype)
        p = pos_dense(rel_positional_encoding(T, D, self.dtype))
        ac = jnp.einsum("nthd,nshd->nhts", q + u_bias, k,
                        preferred_element_type=jnp.float32)
        # the (N, H, T, 2T-1) bd table is the largest attention tensor;
        # keep it in compute dtype (bf16 halves its HBM traffic through
        # the einsum + rel-shift) and upcast only when joining the f32
        # content scores
        bd = jnp.einsum("nthd,mhd->nhtm", q + v_bias, p)
        bd = rel_shift_gather(bd)
        scores = (ac + bd.astype(jnp.float32)) \
            / jnp.sqrt(Dh).astype(jnp.float32)
        # mask: (N, T) valid; softmax in f32 for stability
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        left, right = self.context
        if left >= 0 or right >= 0:
            t_q = jnp.arange(T)[:, None]
            t_k = jnp.arange(T)[None, :]
            band = jnp.ones((T, T), bool)
            if left >= 0:
                band &= t_k >= t_q - left
            if right >= 0:
                band &= t_k <= t_q + right
            scores = jnp.where(band[None, None, :, :], scores, neg)
        # softmax in f32, then drop to compute dtype BEFORE the query
        # mask and dropout so those two elementwise passes move half the
        # bytes (the (N, H, T, T) probs are pure HBM traffic)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = jnp.where(mask[:, None, :, None], attn,
                         jnp.zeros((), self.dtype))
        attn = Dropout(self.dropout_rate)(attn, deterministic)
        out = jnp.einsum("nhts,nshd->nthd", attn, v,
                         preferred_element_type=jnp.float32)
        out = nn.DenseGeneral(D, axis=(-2, -1), dtype=self.dtype,
                              name="out")(out.astype(self.dtype))
        return out.astype(x.dtype)


class FFModule(nn.Module):
    """Conformer feed-forward module (layer.py:424-451).

    With residual_alpha > 0 the module returns x + α·ff(x) (the cell's
    half-step residual folded in), which lets the fused Pallas path
    (ops/ffn_pallas.py, perf flag "fused_ffn") run LN, both matmuls,
    SiLU, both dropouts and the residual in a single kernel each way —
    no (N, T, 4D) tensor ever reaches HBM. Param structure is identical
    in both paths (same LayerNorm_0/Dense_0/Dense_1 submodules)."""

    d_model: int
    expansion: int = 4
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    residual_alpha: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        from cat_tpu.utils.flags import resolve
        mode = resolve("fused_ffn")
        # multi-chip: ops/ffn_pallas.py registers custom_partitioning
        # rules (rows sharded, weights replicated, dW psum'd), so the
        # fused path stays on under a data-parallel mesh
        if mode == "force":
            mode = "1"
        D = x.shape[-1]
        F = self.d_model * self.expansion
        if (mode in ("1", "interpret") and self.residual_alpha > 0.0
                and x.ndim == 3 and D % 128 == 0 and F % 128 == 0):
            ln = nn.LayerNorm(dtype=jnp.float32)
            d1 = nn.Dense(F, dtype=self.dtype)
            d2 = nn.Dense(self.d_model, dtype=self.dtype)
            # materialize params with shape-bearing probe calls (the
            # probes are dead code, DCE'd by XLA); read the arrays off
            # the bound submodules so the param tree matches the stock
            # path exactly
            ln(jnp.zeros((1, D), jnp.float32))
            d1(jnp.zeros((1, D), self.dtype))
            d2(jnp.zeros((1, F), self.dtype))
            p = lambda m, k: m.variables["params"][k]
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = None
            if rate > 0.0:
                from cat_tpu.ops.dropout_pallas import key_to_seed
                seed = key_to_seed(self.make_rng("dropout"))
            from cat_tpu.ops.ffn_pallas import fused_ff_residual
            from jax.ad_checkpoint import checkpoint_name
            out = fused_ff_residual(
                x, p(ln, "scale"), p(ln, "bias"),
                p(d1, "kernel"), p(d1, "bias"),
                p(d2, "kernel"), p(d2, "bias"),
                alpha=self.residual_alpha, dropout_rate=rate,
                seed=seed, interpret=(mode == "interpret"))
            # named like the stock path so remat policies that save
            # "ffn_out" skip re-running the fused forward kernel
            return checkpoint_name(out, "ffn_out")
        h = nn.LayerNorm(dtype=jnp.float32)(x)
        h = nn.Dense(F, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = Dropout(self.dropout_rate)(h, deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        h = Dropout(self.dropout_rate)(h, deterministic)
        if self.residual_alpha > 0.0:
            out = x + self.residual_alpha * h.astype(x.dtype)
        else:
            out = h.astype(x.dtype)
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(out, "ffn_out")


class ConvModule(nn.Module):
    """Conformer convolution module: pointwise-GLU → depthwise → norm →
    swish → pointwise (layer.py:476-533). Masked batch statistics; under
    SPMD jit the batch mean is global, i.e. sync-BN for free."""

    d_model: int
    kernel_size: int = 32
    dropout_rate: float = 0.0
    use_batchnorm: bool = True
    causal: bool = False
    dtype: Any = jnp.float32
    # fold the cell's residual add into the module (enables the fused
    # Pallas entry/exit stages, perf flag "fused_conv_mod" — see
    # ops/conv_module_pallas.py; param tree unchanged)
    residual: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        from cat_tpu.utils.flags import resolve
        mode = resolve("fused_conv_mod")
        # multi-chip: ops/conv_module_pallas.py registers
        # custom_partitioning rules (rows sharded, weights replicated,
        # dW psum'd) like the FF/attention kernels, so the fused path
        # stays on under a data-parallel mesh
        if mode == "force":
            mode = "1"
        D = self.d_model
        fused = (mode in ("1", "interpret") and self.residual
                 and self.use_batchnorm and x.ndim == 3
                 and D % 128 == 0 and x.shape[-1] == D)
        if fused:
            from cat_tpu.ops.conv_module_pallas import (fused_bn_out,
                                                        fused_glu_in)
            ln = nn.LayerNorm(dtype=jnp.float32)
            d1 = nn.Dense(2 * D, dtype=self.dtype)
            ln(jnp.zeros((1, D), jnp.float32))
            d1(jnp.zeros((1, D), self.dtype))
            p = lambda m, k: m.variables["params"][k]
            h = fused_glu_in(x, mask, p(ln, "scale"), p(ln, "bias"),
                             p(d1, "kernel"), p(d1, "bias"),
                             interpret=(mode == "interpret"))
        else:
            h = nn.LayerNorm(dtype=jnp.float32)(x)
            h = nn.Dense(2 * self.d_model, dtype=self.dtype)(h)
            h = nn.glu(h, axis=-1)
            h = jnp.where(mask[:, :, None], h, 0.0)
        k = self.kernel_size
        if self.causal:
            pad = [(k - 1, 0)]
        else:
            pad = [((k - 1) // 2, k - 1 - (k - 1) // 2)]
        h = nn.Conv(self.d_model, (k,), padding=pad,
                    feature_group_count=self.d_model,
                    dtype=self.dtype)(h)
        # depthwise conv is conv_general_dilated, NOT a dot_general — the
        # "dots" remat policies recompute it (and the GLU chain feeding
        # it) in the backward pass. Name it so policies can save it
        # ((N, T', D) bf16 ≈ 39 MB/cell at the flagship shape).
        from jax.ad_checkpoint import checkpoint_name
        h = checkpoint_name(h, "conv_dw")
        conv_out = h
        h = h.astype(jnp.float32)
        if self.use_batchnorm:
            # masked batch statistics over (batch, time)
            cnt = jnp.maximum(jnp.sum(mask.astype(h.dtype)), 1.0)
            mean = jnp.sum(jnp.where(mask[:, :, None], h, 0.0),
                           axis=(0, 1)) / cnt
            var = jnp.sum(jnp.where(mask[:, :, None],
                                    (h - mean) ** 2, 0.0),
                          axis=(0, 1)) / cnt
            scale = self.param("bn_scale", nn.initializers.ones,
                               (self.d_model,))
            bias = self.param("bn_bias", nn.initializers.zeros,
                              (self.d_model,))
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((self.d_model,)))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((self.d_model,)))
            if deterministic:
                use_mean, use_var = ra_mean.value, ra_var.value
            else:
                use_mean, use_var = mean, var
                if not self.is_initializing():
                    m = 0.9
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var
            if fused:
                from cat_tpu.ops.conv_module_pallas import fused_bn_out
                d2 = nn.Dense(self.d_model, dtype=self.dtype)
                d2(jnp.zeros((1, D), self.dtype))
                rate = (0.0 if deterministic
                        else float(self.dropout_rate))
                seed = None
                if rate > 0.0:
                    from cat_tpu.ops.dropout_pallas import key_to_seed
                    seed = key_to_seed(self.make_rng("dropout"))
                return checkpoint_name(fused_bn_out(
                    conv_out, x, mask, use_mean, use_var, scale, bias,
                    d2.variables["params"]["kernel"],
                    d2.variables["params"]["bias"],
                    dropout_rate=rate, seed=seed,
                    interpret=(mode == "interpret")), "conv_mod_out")
            h = (h - use_mean) * jax.lax.rsqrt(use_var + 1e-5)
            h = h * scale + bias
        else:
            h = nn.LayerNorm()(h)
        h = nn.silu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        h = Dropout(self.dropout_rate)(h, deterministic)
        out = jnp.where(mask[:, :, None], h.astype(x.dtype), 0.0)
        if self.residual:
            out = x + out
        return checkpoint_name(out, "conv_mod_out")


class ConformerCell(nn.Module):
    """FF/2 → MHSA → Conv → FF/2 → LN (layer.py:544-573)."""

    d_model: int
    num_heads: int
    kernel_size: int = 32
    ff_expansion: int = 4
    dropout_rate: float = 0.0
    use_batchnorm: bool = True
    causal_conv: bool = False
    dtype: Any = jnp.float32
    attention_context: tuple = (-1, -1)

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        in_dtype = x.dtype  # keep the residual stream in input dtype
        mask = length_mask(lengths, x.shape[1])
        x = FFModule(self.d_model, self.ff_expansion,
                     self.dropout_rate, dtype=self.dtype,
                     residual_alpha=0.5)(x, deterministic)
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(in_dtype)
        x = x + RelPositionMultiHeadAttention(
            self.num_heads, self.d_model, self.dropout_rate,
            dtype=self.dtype,
            context=self.attention_context)(h, mask, deterministic)
        x = ConvModule(self.d_model, self.kernel_size,
                       self.dropout_rate, self.use_batchnorm,
                       self.causal_conv, dtype=self.dtype,
                       residual=True)(x, mask, deterministic)
        x = FFModule(self.d_model, self.ff_expansion,
                     self.dropout_rate, dtype=self.dtype,
                     residual_alpha=0.5)(x, deterministic)
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(in_dtype)
        return jnp.where(mask[:, :, None], x, 0.0)


class TimeReduction(nn.Module):
    """Concatenate-free stride-based time downsampling (layer.py:703-718)."""

    stride: int = 2

    def __call__(self, x, lengths):
        N, T, D = x.shape
        Tp = T // self.stride
        x = x[:, : Tp * self.stride].reshape(N, Tp, self.stride, D)
        x = x.mean(axis=2)
        return x, jnp.maximum(lengths // self.stride, 1)


class Lookahead(nn.Module):
    """Deepspeech-style lookahead conv (layer.py:645-672)."""

    context: int = 5

    @nn.compact
    def __call__(self, x):
        k = self.context
        return nn.Conv(x.shape[-1], (k,), padding=[(0, k - 1)],
                       feature_group_count=x.shape[-1], use_bias=False)(x)


class TDNNLayer(nn.Module):
    """1-D conv layer with dilation ('TDNN', layer.py:674-701)."""

    odim: int
    half_context: int = 1
    dilation: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, lengths):
        k = 2 * self.half_context + 1
        pad = self.half_context * self.dilation
        h = nn.Conv(self.odim, (k,), strides=(self.stride,),
                    kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)])(x)
        h = nn.relu(h)
        if self.stride > 1:
            lengths = jnp.maximum(
                (lengths + self.stride - 1) // self.stride, 1)
        return h, lengths


class SyllableEmbedding(nn.Module):
    """Char embedding + syllable embedding of the mapped char
    (layer.py:956-974 SyllableEmbedding; the converter table maps char
    id → syllable id, generated offline e.g. via pypinyin).

    `converter` is a static tuple of ints of length num_classes."""

    num_classes: int
    dim_emb: int
    converter: tuple
    num_syllables: int = 0

    @nn.compact
    def __call__(self, x):
        n_syl = self.num_syllables or (max(self.converter) + 1)
        conv = jnp.asarray(self.converter, jnp.int32)
        char = nn.Embed(self.num_classes, self.dim_emb,
                        name="char_embedding")(x.astype(jnp.int32))
        syl = nn.Embed(n_syl, self.dim_emb, name="syllable_embedding")(
            conv[x.astype(jnp.int32)])
        return char + syl


def sampled_softmax(logits, labels, n_uniform=0, rng=None):
    """Static-shape sampled softmax (layer.py:894-954 SampledSoftmax).

    Restricts the softmax support to the classes present in `labels`
    (plus `n_uniform` uniformly drawn classes), reducing the (..., V)
    normalization to (..., S). The reference uses torch.unique (dynamic
    shape); here S = labels.size + n_uniform is static and duplicate
    candidates are masked to -inf so each class is counted once.

    Returns (sampled_logits (..., S), remapped_labels) such that
    cross_entropy(sampled_logits, remapped_labels) is the sampled loss.
    """
    flat = labels.reshape(-1).astype(jnp.int32)
    cands = flat
    if n_uniform > 0:
        assert rng is not None
        V = logits.shape[-1]
        extra = jax.random.randint(rng, (n_uniform,), 0, V)
        cands = jnp.concatenate([cands, extra])
    order = jnp.argsort(cands)
    sorted_c = cands[order]
    # first occurrence mask over the sorted candidates
    is_dup = jnp.concatenate([jnp.zeros((1,), bool),
                              sorted_c[1:] == sorted_c[:-1]])
    gathered = jnp.take(logits, sorted_c, axis=-1)
    neg = jnp.finfo(logits.dtype).min
    sampled_logits = jnp.where(is_dup, neg, gathered)
    # each label → index of its first occurrence in sorted_c
    remapped = jnp.searchsorted(sorted_c, flat).astype(jnp.int32)
    return sampled_logits, remapped.reshape(labels.shape)
