"""Acoustic encoders (flax.linen), registry-compatible by class name.

Counterparts of /root/reference/cat/shared/encoder.py: AbsEncoder (:32-56,
optional classifier head), LSTM family (:59-255), ConformerNet (:258-369),
ConformerLSTM (:372-402), EmbeddingEncoder (:465-495). All encoders take
(features, lengths) and return (output, out_lengths); when with_head the
output is logits over num_classes.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from cat_tpu.models.layers import (Conv2dSubsampling, ConformerCell,
                                   Dropout, Lookahead, TDNNLayer,
                                   TimeReduction, VGG2LSubsampling,
                                   length_mask)


def dots_noexpand_saveable(prim, *avals, **params):
    """Checkpoint policy: save no-batch-dim dot outputs EXCEPT expanding
    ones (rhs free dims > contracted dims) — i.e. keep q/k/v/out
    projections and FF down-projections, but recompute the conformer FF
    up-projections and the conv-module GLU pointwise, whose (N, T, 4D) /
    (N, T, 2D) outputs dominate the residual memory of the plain `dots`
    policy (it OOMs the flagship batch-96 shape; this fits)."""
    if prim is not jax.lax.dot_general_p:
        return False
    (lc, rc), (lb, rb) = params["dimension_numbers"]
    if lb or rb:
        return False
    try:
        rhs = avals[1].shape
    except (IndexError, AttributeError):
        return True
    rhs_free = 1
    contracted = 1
    for i, d in enumerate(rhs):
        if i in rc:
            contracted *= d
        else:
            rhs_free *= d
    return rhs_free <= contracted


class LSTMStack(nn.Module):
    """Stack of (bi)LSTM layers with inter-layer dropout."""

    hidden_size: int
    num_layers: int
    bidirectional: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"lstm_fwd_{i}")
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                             reverse=True, keep_order=True,
                             name=f"lstm_bwd_{i}")
                hf = fwd(x, seq_lengths=lengths)
                hb = bwd(x, seq_lengths=lengths)
                x = jnp.concatenate([hf, hb], axis=-1)
            else:
                x = fwd(x, seq_lengths=lengths)
            if i < self.num_layers - 1 and self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate)(
                    x, deterministic=deterministic)
        return x


class _HeadMixin:
    def head(self, h, num_classes, with_head):
        if with_head and num_classes > 0:
            return nn.Dense(num_classes, name="classifier")(h)
        return h


class LSTM(nn.Module):
    """(B)LSTM encoder (encoder.py:59-102)."""

    hdim: int = 512
    num_layers: int = 3
    num_classes: int = 0
    bidirectional: bool = True
    dropout_rate: float = 0.1
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        h = LSTMStack(self.hdim, self.num_layers, self.bidirectional,
                      self.dropout_rate)(x, lengths, deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class VGGLSTM(nn.Module):
    """VGG2L subsampling + BLSTM (encoder.py:105-133)."""

    hdim: int = 320
    num_layers: int = 3
    num_classes: int = 0
    bidirectional: bool = True
    dropout_rate: float = 0.1
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        h, lengths = VGG2LSubsampling()(x, lengths)
        h = LSTMStack(self.hdim, self.num_layers, self.bidirectional,
                      self.dropout_rate)(h, lengths, deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class LSTMrowCONV(nn.Module):
    """Unidirectional LSTM + lookahead row convolution (encoder.py:136-161)."""

    hdim: int = 512
    num_layers: int = 3
    num_classes: int = 0
    dropout_rate: float = 0.1
    lookahead_context: int = 5
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        h = LSTMStack(self.hdim, self.num_layers, False,
                      self.dropout_rate)(x, lengths, deterministic)
        h = Lookahead(self.lookahead_context)(h)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class TDNN_NAS(nn.Module):
    """NAS-derived TDNN stack (encoder.py:164-200; WSJ 11.9M config)."""

    hdim: int = 640
    num_classes: int = 0
    dropout_rate: float = 0.5
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        specs = [(1, 1, 1), (1, 1, 1), (1, 1, 2), (1, 1, 1), (1, 1, 1),
                 (1, 3, 1), (1, 3, 1)]
        h = x
        for i, (hc, dil, stride) in enumerate(specs):
            h, lengths = TDNNLayer(self.hdim, hc, dil, stride,
                                   name=f"tdnn_{i}")(h, lengths)
            h = nn.Dropout(self.dropout_rate)(h,
                                              deterministic=deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class TDNN_LSTM(nn.Module):
    """TDNN-LSTM hybrid (encoder.py:203-233)."""

    hdim: int = 512
    num_lstm_layers: int = 2
    num_classes: int = 0
    dropout_rate: float = 0.1
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        h, lengths = TDNNLayer(self.hdim, 2, 1, 1)(x, lengths)
        h, lengths = TDNNLayer(self.hdim, 2, 1, 3)(h, lengths)
        h = LSTMStack(self.hdim, self.num_lstm_layers, True,
                      self.dropout_rate)(h, lengths, deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class BLSTMN(nn.Module):
    """BLSTM with inter-layer LayerNorm (encoder.py:236-255 uses BN; LN is
    the mask-exact equivalent here)."""

    hdim: int = 320
    num_layers: int = 3
    num_classes: int = 0
    dropout_rate: float = 0.1
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        h = x
        for i in range(self.num_layers):
            h = LSTMStack(self.hdim, 1, True, 0.0,
                          name=f"blstm_{i}")(h, lengths, deterministic)
            h = nn.LayerNorm()(h)
            h = nn.Dropout(self.dropout_rate)(h,
                                              deterministic=deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class ConformerNet(nn.Module):
    """Conformer encoder (encoder.py:258-369): conv2d subsampling →
    linear → N conformer cells (rel-pos MHSA) → optional TimeReduction →
    optional classifier head."""

    num_cells: int = 17
    hdim: int = 512
    num_heads: int = 8
    kernel_size: int = 32
    num_classes: int = 0
    dropout_rate: float = 0.1
    subsampling: str = "conv2d"  # or "vgg2l"
    time_reduction_layer: int = -1  # insert TimeReduction after this cell
    time_reduction_stride: int = 2
    use_batchnorm: bool = True
    with_head: bool = True
    dtype: str = "float32"  # "bfloat16" for MXU-friendly compute
    subsampling_chunk: int = 0  # time-chunked conv subsampling (output
    # frames per chunk; bounds the conv transient, see Conv2dSubsampling)
    remat: bool = False     # rematerialize cells (memory for FLOPs)
    remat_policy: str = ""  # "" = full remat; "dots" = save MXU outputs
    # and recompute only elementwise ops in the backward pass (faster,
    # slightly more HBM)
    scan_layers: bool = False  # nn.scan over stacked cell params:
    # compiles ONE cell instead of num_cells (compile-time killer for
    # deep stacks); requires time_reduction_layer < 0
    subsampling_remat: bool = True  # recompute the conv subsampling in
    # the backward pass (conv_a's transient is ~4 GB bf16 at flagship
    # batch 128; turn off if HBM allows to skip the recompute)

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        if self.subsampling == "conv2d":
            sub_cls = Conv2dSubsampling
            if self.remat and self.subsampling_remat:
                # the subsampling activations dominate peak HBM
                # (largest single allocation of a train step: conv_a's
                # (N, T/2, F/2, D)) — recompute them in the backward
                # pass under remat. Save conv_b's 4x-smaller output so
                # only the cheap 1-input-channel conv_a is recomputed
                # (conv_b alone is ~3.4 TFLOP at the flagship shape).
                sub_cls = nn.remat(
                    Conv2dSubsampling,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "sub_conv_b"))
            h, lengths = sub_cls(self.hdim, dtype=dtype,
                                 time_chunk=self.subsampling_chunk)(
                x, lengths)
        elif self.subsampling == "vgg2l":
            h, lengths = VGG2LSubsampling()(x, lengths)
            h = nn.Dense(self.hdim)(h)
        else:
            raise ValueError(self.subsampling)
        # keep the inter-cell residual stream in compute dtype: halves
        # the nn.scan carry stack (num_cells, N, T', D) saved for bwd
        h = h.astype(dtype)
        from cat_tpu.utils.flags import resolve
        if resolve("pad_time8") == "1" and h.shape[1] % 8:
            # masked no-op frames; makes the attention kernels' 8-row
            # padding an identity so no per-cell pad copies happen
            h = jnp.pad(h, ((0, 0), (0, (-h.shape[1]) % 8), (0, 0)))
        h = Dropout(self.dropout_rate)(h, deterministic)
        cell_kw = dict(d_model=self.hdim, num_heads=self.num_heads,
                       kernel_size=self.kernel_size, ff_expansion=4,
                       dropout_rate=self.dropout_rate,
                       use_batchnorm=self.use_batchnorm,
                       causal_conv=False, dtype=dtype)
        cell_cls = ConformerCell
        if self.remat:
            policy = None
            if self.remat_policy == "dots":
                policy = (jax.checkpoint_policies
                          .dots_with_no_batch_dims_saveable)
            elif self.remat_policy == "dots_noexpand":
                # also save the fused flash-attention output (named in
                # RelPositionMultiHeadAttention) — the Pallas forward is
                # expensive to re-run in the backward
                policy = jax.checkpoint_policies.save_from_both_policies(
                    dots_noexpand_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_attn", "flash_attn_lse"))
            elif self.remat_policy == "flash_mods":
                # flash_only + each module's OUTPUT (the residual
                # stream after FF1/Conv/FF2): the backward no longer
                # re-runs the fused FF/conv forward kernels just to
                # rebuild inter-module values. ~2.7 GB extra residency
                # at the flagship batch-128 shape; best with
                # scan_layers=false (no stacking copies)
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_attn", "flash_attn_lse", "ffn_out",
                    "conv_mod_out")
            elif self.remat_policy == "flash_ffn":
                # flash_only + the two FF-module outputs per cell: the
                # backward stops re-running the fused-FF forward
                # kernels (~1.3 ms/cell of pure re-forward under
                # flash_only) without also pinning the conv-module
                # output (flash_mods' extra residency made XLA remat
                # elsewhere and measured WORSE end-to-end in round 4)
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_attn", "flash_attn_lse", "ffn_out")
            elif self.remat_policy == "flash_only":
                # leanest residual set: keep only the fused attention
                # kernel outputs and recompute every projection in the
                # backward pass. Trades ~6 cheap MXU matmuls of
                # recompute per cell against ~6 fewer stacked scan
                # residual buffers (each a dynamic-update-slice copy +
                # 666 MB of HBM at the flagship shape)
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_attn", "flash_attn_lse")
            elif self.remat_policy == "dots_noexpand_conv":
                # dots_noexpand + the depthwise-conv output: the conv is
                # conv_general_dilated (not a dot_general), so the dots
                # policies recompute it and the whole GLU chain feeding
                # it in the backward pass; +39 MB/cell buys that back
                policy = jax.checkpoint_policies.save_from_both_policies(
                    dots_noexpand_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_attn", "flash_attn_lse", "conv_dw"))
            # static_argnums counts the module itself at 0 in flax's
            # lifted core_fn, so `deterministic` is position 3
            cell_cls = nn.remat(ConformerCell, static_argnums=(3,),
                                policy=policy)
        if self.num_cells == 0:
            pass  # subsampling-only (profiling / ablation configs)
        elif self.scan_layers and self.time_reduction_layer < 0:
            cell = cell_cls(**cell_kw, name="cells")

            def body(mdl, carry, lens, det):
                return mdl(carry, lens, det), None

            scan_fn = nn.scan(
                body,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_cells)
            h, _ = scan_fn(cell, h, lengths, deterministic)
        else:
            for i in range(self.num_cells):
                h = cell_cls(**cell_kw, name=f"cell_{i}")(
                    h, lengths, deterministic)
                if i == self.time_reduction_layer:
                    h, lengths = TimeReduction(
                        self.time_reduction_stride)(h, lengths)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(
                h.astype(jnp.float32))
        return h, lengths


class ConformerLSTM(nn.Module):
    """Conformer stack + LSTM tail (encoder.py:372-402)."""

    num_cells: int = 8
    hdim: int = 256
    num_heads: int = 4
    kernel_size: int = 32
    num_lstm_layers: int = 2
    num_classes: int = 0
    dropout_rate: float = 0.1
    with_head: bool = True

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        h, lengths = Conv2dSubsampling(self.hdim)(x, lengths)
        for i in range(self.num_cells):
            h = ConformerCell(self.hdim, self.num_heads, self.kernel_size,
                              name=f"cell_{i}")(h, lengths, deterministic)
        h = LSTMStack(self.hdim, self.num_lstm_layers, False,
                      self.dropout_rate)(h, lengths, deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


class JoinAPLinearEncoder(nn.Module):
    """Phonological-vector output layer (encoder.py:498-543, Whistle):
    logits = enc(x) @ (A·P)ᵀ where P (Np, Dp) is a fixed phonological
    feature matrix and A is learned. Enables multilingual phoneme
    sharing (cv-lang10 recipes)."""

    pv_path: str = ""
    enc_head_type: str = "LSTM"
    enc_head_kwargs: Any = None
    num_classes: int = 0  # injected; must equal P.shape[0]
    with_head: bool = True

    def setup(self):
        import numpy as np

        kw = dict(self.enc_head_kwargs or {})
        kw["with_head"] = False
        kw.pop("num_classes", None)
        self.enc_head = globals()[self.enc_head_type](**kw)
        self.P = jnp.asarray(np.load(self.pv_path), jnp.float32)
        self._a = nn.Dense(self._hdim(kw), name="A")

    def _hdim(self, kw):
        h = kw.get("hdim", 512)
        if self.enc_head_type == "LSTM" and kw.get("bidirectional",
                                                   True):
            return 2 * h
        return h

    def ap(self):
        return self._a(self.P)  # (Np, H)

    def __call__(self, x, lengths, deterministic=True):
        h, lengths = self.enc_head(x, lengths,
                                   deterministic=deterministic)
        return h @ self.ap().T, lengths


class JoinAPNonLinearEncoder(nn.Module):
    """Nonlinear variant (encoder.py:545-579): AP = A2(σ(A1·P))."""

    pv_path: str = ""
    ap_hdim: int = 512
    enc_head_type: str = "LSTM"
    enc_head_kwargs: Any = None
    num_classes: int = 0
    with_head: bool = True

    def setup(self):
        import numpy as np

        kw = dict(self.enc_head_kwargs or {})
        kw["with_head"] = False
        kw.pop("num_classes", None)
        self.enc_head = globals()[self.enc_head_type](**kw)
        self.P = jnp.asarray(np.load(self.pv_path), jnp.float32)
        h = kw.get("hdim", 512)
        if self.enc_head_type == "LSTM" and kw.get("bidirectional",
                                                   True):
            h = 2 * h
        self.A1 = nn.Dense(self.ap_hdim, name="A1")
        self.A2 = nn.Dense(h, name="A2")

    def ap(self):
        return self.A2(nn.sigmoid(self.A1(self.P)))

    def __call__(self, x, lengths, deterministic=True):
        h, lengths = self.enc_head(x, lengths,
                                   deterministic=deterministic)
        return h @ self.ap().T, lengths


class EmbeddingEncoder(nn.Module):
    """Token-input encoder for P2G (encoder.py:465-495): embedding →
    transformer-style conformer cells without subsampling."""

    vocab_size: int = 0
    num_cells: int = 6
    hdim: int = 256
    num_heads: int = 4
    kernel_size: int = 15
    num_classes: int = 0
    dropout_rate: float = 0.1
    with_head: bool = True
    use_batchnorm: bool = False  # token encoders default to LN

    @nn.compact
    def __call__(self, tokens, lengths, deterministic=True):
        h = nn.Embed(self.vocab_size, self.hdim)(tokens.astype(jnp.int32))
        for i in range(self.num_cells):
            h = ConformerCell(self.hdim, self.num_heads, self.kernel_size,
                              use_batchnorm=self.use_batchnorm,
                              name=f"cell_{i}")(h, lengths, deterministic)
        if self.with_head and self.num_classes > 0:
            h = nn.Dense(self.num_classes, name="classifier")(h)
        return h, lengths


# config-selectable HF integration (trainable wav2vec2 trunk composed
# as a flax submodule — models/pretrained.py)
from cat_tpu.models.pretrained import Wav2Vec2Encoder  # noqa: E402,F401
