"""CTC-CRF loss: numerator CTC + denominator WFST log-partition.

TPU-native replacement for the reference's gpu_den CUDA kernels
(/root/reference/src/ctc_crf/gpu_den/den_calculate.cu — per-frame
kernel-launch alpha loop at :427-451, atomic-CAS beta/grad accumulation
at :189-253) and the _CTC_CRF autograd wrapper
(/root/reference/src/ctc_crf/ctc_crf/__init__.py:58-94:
cost = den_lld − (1+λ)·ctc_lld).

Design — scatter-free, pre-padded arc tables (TPU-first):
XLA lowers scatter (and multi-dimensional gathers) poorly on TPU, so the
graph is preprocessed ON THE HOST into three PADDED arc tables, one per
grouping (incoming state for alpha, outgoing state for beta, label for
the gradient row). In each table, every segment's arcs are padded to a
power-of-2 bucket width and laid out contiguously; a "segment reduction"
is then: compute per-arc values directly in table order (1-D index
gathers only) → slice + reshape (free) → dense logsumexp/sum along the
bucket axis (VPU) → one 1-D gather to assemble segment order. No
scatters, deterministic, bitwise reproducible — unlike the reference's
atomic log-plus.

- One `lax.scan` over frames computes all alphas.
- The backward pass is a reverse scan carrying beta and emitting the
  per-frame gradient row directly (betas never materialized).
- Variable lengths freeze alpha/beta at padded frames (branch-free).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.ops.semiring import LOG_EPS


def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


class _PaddedTable:
    """One padded, bucket-ordered copy of the arc table grouped by `ids`.

    Arrays (length A_pad, host-built, device-resident):
      src, dst, label: int32 (padding arcs point at 0)
      weight: f32 (padding arcs get LOG_EPS so they vanish in both the
        log-semiring and, after exp-thresholding, in probability sums)
    bucket_slices: [(start, S_d, d)] contiguous regions per bucket width.
    assemble: (num_segments,) int32 gather index into the R+1 reduced
      rows (last row = identity/pad for segments with no arcs).
    """

    def __init__(self, ids, src, dst, label, weight, num_segments):
        ids = np.asarray(ids)
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        label = np.asarray(label, np.int32)
        weight = np.asarray(weight, np.float32)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        uniq, starts, counts = np.unique(sorted_ids, return_index=True,
                                         return_counts=True)
        by_width: dict[int, list] = {}
        for u, s, c in zip(uniq, starts, counts):
            d = 1 << int(np.ceil(np.log2(max(int(c), 1))))
            by_width.setdefault(d, []).append((int(u), order[s:s + c]))
        src_p, dst_p, lab_p, w_p = [], [], [], []
        self.bucket_slices = []
        concat_rows = []
        pos = 0
        for d in sorted(by_width):
            entries = by_width[d]
            S_d = len(entries)
            self.bucket_slices.append((pos, S_d, d))
            for u, idxs in entries:
                n = len(idxs)
                src_p.append(np.pad(src[idxs], (0, d - n)))
                dst_p.append(np.pad(dst[idxs], (0, d - n)))
                lab_p.append(np.pad(label[idxs], (0, d - n)))
                w_p.append(np.pad(weight[idxs], (0, d - n),
                                  constant_values=LOG_EPS))
                concat_rows.append(u)
            pos += S_d * d
        self.src = jnp.asarray(np.concatenate(src_p))
        self.dst = jnp.asarray(np.concatenate(dst_p))
        self.label = jnp.asarray(np.concatenate(lab_p))
        self.weight = jnp.asarray(np.concatenate(w_p))
        R = len(concat_rows)
        assemble = np.full((num_segments,), R, np.int32)
        for r, q in enumerate(concat_rows):
            assemble[q] = r
        self.assemble = jnp.asarray(assemble)
        self.num_rows = R
        self.padded_size = pos

    def reduce(self, values, op="logsumexp"):
        """values (N, A_pad) in table order → (N, num_segments)."""
        N = values.shape[0]
        pad_val = LOG_EPS if op == "logsumexp" else 0.0
        parts = []
        for start, S_d, d in self.bucket_slices:
            blk = values[:, start:start + S_d * d].reshape(N, S_d, d)
            if op == "logsumexp":
                m = jnp.max(blk, axis=-1)
                m_safe = jnp.maximum(m, LOG_EPS)
                red = m_safe + jnp.log(jnp.maximum(
                    jnp.sum(jnp.exp(blk - m_safe[..., None]), axis=-1),
                    1e-37))
                red = jnp.where(m <= LOG_EPS / 2, LOG_EPS, red)
            else:
                red = jnp.sum(blk, axis=-1)
            parts.append(red)
        concat = jnp.concatenate(
            parts + [jnp.full((N, 1), pad_val, values.dtype)], axis=1)
        return concat[:, self.assemble]


class DenDevice:
    """Device-resident denominator graph with padded reduce tables.

    Equivalent role to the reference's CRFContext which preloads the den
    LM per GPU (ctc_crf/__init__.py:147-171)."""

    def __init__(self, src, dst, label, weight, start_w, final_w,
                 num_states):
        src = np.asarray(src)
        A = len(src)
        self.start_w = jnp.asarray(start_w, jnp.float32)
        self.final_w = jnp.asarray(final_w, jnp.float32)
        self.num_states = int(num_states)
        self.num_arcs = A
        self.num_labels = int(np.asarray(label).max()) + 1 if A else 1
        args = (src, dst, label, weight)
        self.by_dst = _PaddedTable(dst, *args, self.num_states)
        self.by_src = _PaddedTable(src, *args, self.num_states)
        self.by_label = _PaddedTable(label, *args, self.num_labels)

    @classmethod
    def from_graph(cls, g):
        return cls(g.arc_src, g.arc_dst, g.arc_label, g.arc_weight,
                   g.start_weights, g.final_weights, g.num_states)


def _den_forward(log_probs, input_lengths, den: "DenDevice"):
    """All alphas (T, N, Q) + logZ (N,). alphas[t] = alpha BEFORE
    consuming frame t."""
    N, T, V = log_probs.shape
    y = jnp.transpose(log_probs, (1, 0, 2))  # (T, N, V)
    alpha0 = jnp.broadcast_to(den.start_w, (N, den.num_states))
    tab = den.by_dst

    def step(alpha, xs):
        y_t, t = xs
        em = y_t[:, tab.label]                      # (N, A_pad)
        scores = alpha[:, tab.src] + tab.weight[None, :] + em
        nxt = tab.reduce(scores)
        nxt = jnp.maximum(nxt, LOG_EPS)
        keep = (t < input_lengths)[:, None]
        nxt = jnp.where(keep, nxt, alpha)
        return nxt, alpha

    t_idx = jnp.arange(T)
    alpha_last, alphas = jax.lax.scan(step, alpha0, (y, t_idx))
    logz = jax.nn.logsumexp(
        jnp.where(den.final_w[None, :] <= LOG_EPS / 2, -jnp.inf,
                  alpha_last + den.final_w[None, :]), axis=1)
    return alphas, logz


def _den_impl(log_probs, input_lengths, den):
    alphas, logz = _den_forward(log_probs, input_lengths, den)
    return logz, (alphas, logz)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def den_log_partition(log_probs, input_lengths, den):
    """log Z(x): denominator WFST log-partition per utterance.

    Args:
      log_probs: (N, T, V) frame scores (typically log-softmax outputs).
      input_lengths: (N,) frame counts.
      den: DenDevice graph.
    Returns: (N,) log-partition values.
    """
    logz, _ = _den_impl(log_probs, input_lengths, den)
    return logz


def _den_fwd(log_probs, input_lengths, den):
    logz, res = _den_impl(log_probs, input_lengths, den)
    alphas, _ = res
    return logz, (log_probs, input_lengths, alphas, logz)


def _den_bwd(den, res, g):
    log_probs, input_lengths, alphas, logz = res
    N, T, V = log_probs.shape
    y = jnp.transpose(log_probs, (1, 0, 2))  # (T, N, V)
    tsrc = den.by_src
    tlab = den.by_label

    def step(beta, xs):
        y_t, alpha_t, t = xs
        active = (t < input_lengths)[:, None]
        # beta recursion on the by-src table
        rhs = (tsrc.weight[None, :] + y_t[:, tsrc.label]
               + beta[:, tsrc.dst])
        beta_prev = jnp.maximum(tsrc.reduce(rhs), LOG_EPS)
        beta_out = jnp.where(active, beta_prev, beta)
        # arc posteriors on the by-label table → (N, L) gradient row
        xi = (alpha_t[:, tlab.src] + tlab.weight[None, :]
              + y_t[:, tlab.label] + beta[:, tlab.dst]
              - logz[:, None])
        xi = jnp.where(xi <= LOG_EPS / 2, 0.0, jnp.exp(xi))
        xi = jnp.where(active, xi, 0.0)
        grad_row = tlab.reduce(xi, op="sum")
        return beta_out, grad_row

    t_idx = jnp.arange(T)
    beta_T = jnp.broadcast_to(den.final_w, (N, den.num_states))
    _, grad_rows = jax.lax.scan(step, beta_T, (y, alphas, t_idx),
                                reverse=True)
    grad_rows = jnp.transpose(grad_rows, (1, 0, 2))  # (N, T, L)
    if den.num_labels < V:
        grad_rows = jnp.pad(grad_rows,
                            ((0, 0), (0, 0), (0, V - den.num_labels)))
    grad = grad_rows * g[:, None, None]
    return (grad, _float0_zeros(input_lengths))


den_log_partition.defvjp(_den_fwd, _den_bwd)


def ctc_crf_loss(log_probs, labels, input_lengths, label_lengths, den,
                 lamb=0.1, blank=0, reduction="mean"):
    """CTC-CRF (lattice-free MMI) loss with CTC regularization.

    cost = den_lld − (1+λ)·ctc_lld, batch-reduced — exactly the
    combination of the reference's _CTC_CRF.forward
    (ctc_crf/__init__.py:81-83).
    """
    nll_ctc = ctc_loss(log_probs, labels, input_lengths, label_lengths,
                       blank=blank, reduction="none")
    logz = den_log_partition(log_probs, input_lengths, den)
    per_seq = logz + (1.0 + lamb) * nll_ctc
    if reduction == "none":
        return per_seq
    if reduction == "sum":
        return jnp.sum(per_seq)
    if reduction == "mean":
        return jnp.mean(per_seq)
    raise ValueError(f"bad reduction {reduction}")
