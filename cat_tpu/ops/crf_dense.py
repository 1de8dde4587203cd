"""Dense MXU-native CTC-CRF denominator for n-gram LMs (order ≤ 3).

THE TPU-first replacement for the reference's gpu_den WFST kernels
(/root/reference/src/ctc_crf/gpu_den/den_calculate.cu): instead of a
sparse arc-table forward-backward (gathers/scatters — which TPU hardware
fundamentally lacks fast support for), the backoff n-gram denominator LM
is expanded on the host into a DENSE context-transition tensor

    W[a, b, u] = log P(u | a, b)     (V, V, V), with index 0 = BOS

and the composed T∘G state space factorizes as
{in-phone, post-blank} × (context a, b) — two dense (N, V, V) alpha
tensors. Every recursion step is then an exp-domain batched einsum on the
MXU plus elementwise VPU work: no graph, no gather, no scatter, exact —
in fact MORE exact than the reference: full backoff expansion has no
epsilon-arc double-counting.

State semantics:
  a_in[n, a, b]  — currently emitting phone b, LM context (a, b)
  a_bl[n, a, b]  — post-blank, last context (a, b)
Transitions per frame (y = frame log-probs, blank = 0):
  stay:   a_in[a,b]   + y[b]            → a_in[a,b]
  blank:  (a_in ⊕ a_bl)[a,b] + y[0]     → a_bl[a,b]
  emit u: (a_bl[a,c1] ⊕ a_in[a,c1]|u≠c1) + W[a,c1,u] + y[u]
                                         → a_in[c1,u]
Log-partition: logZ = LSE over both tensors of alpha + F, with
F[a,b] = log P(EOS | a, b).

A bigram LM is handled by the same code (W constant over `a`); higher
orders fall back to cat_tpu.ops.crf (arc tables — correct everywhere,
fast on CPU/GPU-class backends).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.ctc import ctc_loss
from cat_tpu.ops.semiring import LOG_EPS

LN10 = math.log(10.0)

# inner-scan unroll factor for the per-frame recursions (see seg_step)
import os as _os
UNROLL = int(_os.environ.get("CAT_TPU_DEN_UNROLL", "1"))  # 8 measured SLOWER on-device (while-loop group 44 -> 71 ms/step)


class DenseDen:
    """Host-expanded dense denominator tables. V includes blank at 0;
    context symbol 0 doubles as BOS (blank never appears in contexts)."""

    def __init__(self, logw, final, ckpt_every=24):
        # logw (V, V, V) f32: log P(u | a, b); entries for u == 0 are
        # LOG_EPS (blank is not an LM event). final (V, V) f32.
        # ckpt_every: alpha-checkpoint segment length (frames) — memory
        # for the forward-backward is O(T/K + K) alpha tensors, not O(T).
        self.logw = jnp.asarray(logw, jnp.float32)
        self.final = jnp.asarray(final, jnp.float32)
        self.num_classes = int(logw.shape[0])
        self.ckpt_every = int(ckpt_every)

    @classmethod
    def from_ngram(cls, lm, num_classes, bos_id=0):
        """Expand a (≤3)-gram NGramLM over phone ids 1..V-1.

        Vectorized backoff expansion: build the unigram row once, then
        per-context rows as bow + parent row overwritten by explicit
        n-gram entries (instead of V^3 individual logp() calls)."""
        V = num_classes
        BOSs = "<s>"
        EOSs = "</s>"

        def tok(i):
            return BOSs if i == 0 else i

        syms = [tok(i) for i in range(V)]  # index 0 = BOS sentinel
        NEG = LOG_EPS / LN10  # in log10 domain

        # unigram row over events u in 1..V-1 plus EOS at column V
        uni = np.full((V + 1,), NEG, np.float64)
        for u in range(1, V):
            p = lm.probs[1].get((u,))
            if p is not None:
                uni[u] = p
        pe = lm.probs[1].get((EOSs,))
        if pe is not None:
            uni[V] = pe

        order = lm.order

        def expand(ctx, parent_row):
            """Row for `ctx` (tuple of symbols) given its backoff
            parent's row."""
            k = len(ctx)
            bow = lm.bows[k].get(ctx, 0.0) if k < len(lm.bows) else 0.0
            row = parent_row + bow
            probs_k1 = lm.probs[k + 1]
            for u in range(1, V):
                p = probs_k1.get(ctx + (u,))
                if p is not None:
                    row[u] = p
            pe = probs_k1.get(ctx + (EOSs,))
            if pe is not None:
                row[V] = pe
            return row

        logw = np.full((V, V, V), LOG_EPS, np.float32)
        final = np.full((V, V), LOG_EPS, np.float32)

        if order == 1:
            row = uni * LN10
            logw[:, :, 1:] = row[1:V].astype(np.float32)
            final[:, :] = np.float32(row[V])
            return cls(logw, final)

        # bigram rows per last-context symbol b
        bi_rows = {}
        for b in range(V):
            bi_rows[b] = expand((syms[b],), uni.copy())
        if order == 2:
            for b in range(V):
                row = bi_rows[b] * LN10
                logw[:, b, 1:] = row[1:V].astype(np.float32)
                final[:, b] = np.float32(row[V])
            return cls(logw, final)

        # trigram rows per (a, b); contexts (x, BOS) with x != BOS are
        # unreachable and stay LOG_EPS
        for a in range(V):
            for b in range(V):
                if b == 0 and a != 0:
                    continue
                ctx = (syms[a], syms[b])
                # truncate like NGramLM.logp: if (a,b) never occurs as a
                # stored context, fall back to the bigram row for b
                row = expand(ctx, bi_rows[b].copy()) * LN10
                logw[a, b, 1:] = row[1:V].astype(np.float32)
                final[a, b] = np.float32(row[V])
        return cls(logw, final)

    def device_tables(self):
        """exp-domain tables for the MXU path."""
        return (jnp.exp(jnp.maximum(self.logw, LOG_EPS)),
                self.final)

    def save(self, path):
        np.savez(path, logw=np.asarray(self.logw),
                 final=np.asarray(self.final))

    @classmethod
    def load(cls, path):
        z = np.load(path)
        return cls(z["logw"], z["final"])


def _lse_pair(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= LOG_EPS / 2, LOG_EPS, out)


def _emit_contract(src, expw):
    """T[n, b, u] = LSE_a(src[n, a, b] + W[a, b, u]) via exp-domain
    matmul with per-(n,b) max shift. expw = exp(W) (V,V,V)."""
    m = jnp.max(src, axis=1)                      # (N, V_b)
    m_safe = jnp.maximum(m, LOG_EPS)
    p = jnp.exp(src - m_safe[:, None, :])         # (N, V_a, V_b)
    s = jnp.einsum("nab,abu->nbu", p, expw,
                   preferred_element_type=jnp.float32)
    out = m_safe[:, :, None] + jnp.log(jnp.maximum(s, 1e-37))
    return jnp.where(s <= 0.0, LOG_EPS, out)


def _beta_contract(rhs, expw):
    """E[n, a, b] = LSE_u(rhs[n, b, u] + W[a, b, u])."""
    m = jnp.max(rhs, axis=2)                      # (N, V_b)
    m_safe = jnp.maximum(m, LOG_EPS)
    p = jnp.exp(rhs - m_safe[:, :, None])         # (N, V_b, V_u)
    s = jnp.einsum("nbu,abu->nab", p, expw,
                   preferred_element_type=jnp.float32)
    out = m_safe[:, None, :] + jnp.log(jnp.maximum(s, 1e-37))
    return jnp.where(s <= 0.0, LOG_EPS, out)


def _clamp(x):
    return jnp.maximum(x, LOG_EPS)


def _diag_mask(V):
    """(V_b, V_u) mask: True where u == b (disallowed direct repeat)."""
    return jnp.eye(V, dtype=bool)


def _alpha_step(expw, eye, input_lengths, carry, xs):
    """One dense-den alpha recursion frame (shared by fwd + recompute)."""
    a_in, a_bl = carry
    y_t, t = xs
    # emission into context (b, u): from post-blank (any u) or from
    # in-phone (direct switch, u != b); contraction over `a`. The two
    # sources share expw, so one stacked (2N, a, b) contraction halves
    # the in-loop op count (the scan is per-iteration-overhead-bound
    # on this backend, not FLOP-bound).
    both = _emit_contract(jnp.concatenate([a_bl, a_in], axis=0), expw)
    N = a_in.shape[0]
    t1 = both[:N]                                   # (N, b, u)
    t2 = jnp.where(eye[None, :, :], LOG_EPS, both[N:])
    emit = _lse_pair(t1, t2) + y_t[:, None, :]
    stay = a_in + y_t[:, None, :]                   # + y[c2]
    new_in = _clamp(_lse_pair(stay, emit))
    new_bl = _clamp(_lse_pair(a_in, a_bl) + y_t[:, 0][:, None, None])
    keep = (t < input_lengths)[:, None, None]
    new_in = jnp.where(keep, new_in, a_in)
    new_bl = jnp.where(keep, new_bl, a_bl)
    return (new_in, new_bl), (a_in, a_bl)


def _pad_frames(log_probs, K):
    """Pad T up to a multiple of K (padded frames are no-ops: masked by
    input_lengths everywhere). Returns (y (Tp, N, V), Tp)."""
    N, T, V = log_probs.shape
    Tp = ((T + K - 1) // K) * K
    y = jnp.transpose(log_probs, (1, 0, 2))       # (T, N, V)
    if Tp != T:
        y = jnp.concatenate(
            [y, jnp.full((Tp - T, N, V), LOG_EPS, y.dtype)], axis=0)
    return y, Tp


def _forward(log_probs, input_lengths, expw, final, K):
    """Segment-checkpointed alpha recursion.

    Memory design: storing every alpha frame costs 2·T·N·V² floats
    (≈3 GB at the flagship shape) — the reason the reference-scale
    batch could not grow. Instead only segment-boundary alphas
    (T/K snapshots) are kept; the backward pass recomputes the K
    in-segment frames, gradient-checkpoint style, cutting den memory
    by ~K× for one extra forward contraction per frame."""
    N, T, V = log_probs.shape
    y, Tp = _pad_frames(log_probs, K)
    S = Tp // K
    a_in0 = jnp.full((N, V, V), LOG_EPS)
    a_bl0 = jnp.full((N, V, V), LOG_EPS).at[:, 0, 0].set(0.0)
    eye = _diag_mask(V)
    step = partial(_alpha_step, expw, eye, input_lengths)

    y_seg = y.reshape(S, K, N, V)
    t_seg = jnp.arange(Tp).reshape(S, K)

    def seg_step(carry, xs):
        ys, ts = xs
        snapshot = carry  # alphas at segment start
        # unroll: the while-loop per-iteration overhead (~50 us/frame on
        # the tunneled v5e) dwarfs the per-frame einsum; unrolled frames
        # amortize it across the segment
        carry, _ = jax.lax.scan(lambda c, x: (step(c, x)[0], None),
                                carry, (ys, ts), unroll=UNROLL)
        return carry, snapshot

    (ain_T, abl_T), snaps = jax.lax.scan(seg_step, (a_in0, a_bl0),
                                         (y_seg, t_seg))

    def lse_all(x):
        m = jnp.max(x, axis=(1, 2))
        m_safe = jnp.maximum(m, LOG_EPS)
        s = jnp.sum(jnp.exp(x - m_safe[:, None, None]), axis=(1, 2))
        return jnp.where(s <= 0, LOG_EPS,
                         m_safe + jnp.log(jnp.maximum(s, 1e-37)))

    logz = _lse_pair(lse_all(ain_T + final[None]),
                     lse_all(abl_T + final[None]))
    return snaps, (ain_T, abl_T), logz


def _use_pallas_den():
    """Route the den forward through the fused Pallas kernel (perf.
    fused_den = "1", env override CAT_TPU_FUSED_DEN; interpret mode off
    TPU). Falls back to the XLA scan under an active mesh — the kernel
    has no custom_partitioning rules yet."""
    from cat_tpu.utils import flags
    from cat_tpu.ops.partitioning import use_partitioned

    v = flags.resolve("fused_den")
    if not v or v == "0":
        return False
    return not use_partitioned()


def _den_impl(log_probs, input_lengths, den: DenseDen):
    if _use_pallas_den():
        from cat_tpu.ops.crf_dense_pallas import dense_den_forward_pallas

        snaps, logz = dense_den_forward_pallas(
            log_probs, input_lengths, den,
            interpret=jax.default_backend() != "tpu")
        return logz, (snaps, logz)
    expw, final = den.device_tables()
    K = den.ckpt_every
    snaps, lasts, logz = _forward(log_probs, input_lengths, expw, final,
                                  K)
    return logz, (snaps, logz)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dense_den_log_partition(log_probs, input_lengths, den):
    """(N,) log-partition of the dense n-gram denominator."""
    logz, _ = _den_impl(log_probs, input_lengths, den)
    return logz


def _den_fwd(log_probs, input_lengths, den):
    logz, res = _den_impl(log_probs, input_lengths, den)
    snaps, _ = res
    return logz, (log_probs, input_lengths, snaps, logz)


def _den_bwd(den, res, g):
    log_probs, input_lengths, snaps, logz = res
    expw, final = den.device_tables()
    K = den.ckpt_every
    N, T, V = log_probs.shape
    y, Tp = _pad_frames(log_probs, K)
    S = Tp // K
    eye = _diag_mask(V)
    logz_safe = jnp.where(logz <= LOG_EPS / 2, 0.0, logz)
    astep = partial(_alpha_step, expw, eye, input_lengths)

    def beta_step(carry, xs):
        b_in, b_bl = carry  # betas AFTER this frame (t+1 position)
        y_t, a_in, a_bl, t = xs
        active = (t < input_lengths)[:, None, None]
        # rhs[n, b, u] = y[u] + beta_in^{t+1}[(b, u)]  (emission target)
        rhs = y_t[:, None, :] + b_in
        rhs_m = jnp.where(eye[None], LOG_EPS, rhs)
        # one stacked contraction for both variants (see _alpha_step)
        E_both = _beta_contract(jnp.concatenate([rhs, rhs_m], axis=0),
                                expw)
        N_ = rhs.shape[0]
        E_all = E_both[:N_]                            # any u → (N, a, b)
        E_norep = E_both[N_:]                          # u != b
        blank_term = y_t[:, 0][:, None, None] + b_bl
        # stay at (a, b): y[b] + beta_in^{t+1}[a, b] — numerically the
        # same array as rhs, read with axes (a, b).
        new_b_in = _clamp(_lse_pair(_lse_pair(rhs, E_norep), blank_term))
        new_b_bl = _clamp(_lse_pair(E_all, blank_term))
        new_b_in = jnp.where(active, new_b_in, b_in)
        new_b_bl = jnp.where(active, new_b_bl, b_bl)

        # gradient row for frame t (transitions consume y_t):
        # stay: alpha_in[a,u] + y[u] + b_in[a,u]
        sc_stay = a_in + jnp.broadcast_to(y_t[:, None, :], a_in.shape) \
            + b_in - logz_safe[:, None, None]
        g_stay = jnp.sum(jnp.where(sc_stay <= LOG_EPS / 2, 0.0,
                                   jnp.exp(sc_stay)), axis=1)  # (N, V_u)
        # emit: (T1 ⊕ T2m)[b,u] + y[u] + b_in[b,u]
        t_both = _emit_contract(jnp.concatenate([a_bl, a_in], axis=0),
                                expw)
        t1 = t_both[:N_]
        t2 = jnp.where(eye[None], LOG_EPS, t_both[N_:])
        sc_emit = _lse_pair(t1, t2) + \
            jnp.broadcast_to(y_t[:, None, :], t1.shape) + b_in \
            - logz_safe[:, None, None]
        g_emit = jnp.sum(jnp.where(sc_emit <= LOG_EPS / 2, 0.0,
                                   jnp.exp(sc_emit)), axis=1)
        # blank: (a_in ⊕ a_bl)[a,b] + y[0] + b_bl[a,b]
        sc_bl = _lse_pair(a_in, a_bl) + y_t[:, 0][:, None, None] \
            + b_bl - logz_safe[:, None, None]
        g_blank = jnp.sum(jnp.where(sc_bl <= LOG_EPS / 2, 0.0,
                                    jnp.exp(sc_bl)), axis=(1, 2))
        grad_row = (g_stay + g_emit).at[:, 0].set(g_blank)
        grad_row = jnp.where(active[:, :, 0], grad_row, 0.0)
        return (new_b_in, new_b_bl), grad_row

    y_seg = y.reshape(S, K, N, V)
    t_seg = jnp.arange(Tp).reshape(S, K)

    def seg_step(carry, xs):
        betas = carry
        ys, ts, snap = xs
        # recompute the K in-segment (pre-update) alphas from the
        # segment-start snapshot
        _, (ains, abls) = jax.lax.scan(astep, snap, (ys, ts),
                                       unroll=UNROLL)
        betas, grad_rows = jax.lax.scan(
            beta_step, betas, (ys, ains, abls, ts), reverse=True,
            unroll=UNROLL)
        return betas, grad_rows

    beta0 = (jnp.broadcast_to(final[None], (N, V, V)),
             jnp.broadcast_to(final[None], (N, V, V)))
    _, grad_seg = jax.lax.scan(seg_step, beta0, (y_seg, t_seg, snaps),
                               reverse=True)
    grad_rows = grad_seg.reshape(Tp, N, V)[:T]
    grad = jnp.transpose(grad_rows, (1, 0, 2)) * g[:, None, None]
    return (grad, np.zeros(np.shape(input_lengths),
                           dtype=jax.dtypes.float0))


dense_den_log_partition.defvjp(_den_fwd, _den_bwd)


def ctc_crf_loss_dense(log_probs, labels, input_lengths, label_lengths,
                       den: DenseDen, lamb=0.1, blank=0,
                       reduction="mean"):
    """CTC-CRF loss with the dense MXU denominator
    (cost = den_lld − (1+λ)·ctc_lld, ctc_crf/__init__.py:81-83)."""
    nll_ctc = ctc_loss(log_probs, labels, input_lengths, label_lengths,
                       blank=blank, reduction="none")
    logz = dense_den_log_partition(log_probs, input_lengths, den)
    per_seq = logz + (1.0 + lamb) * nll_ctc
    if reduction == "none":
        return per_seq
    if reduction == "sum":
        return jnp.sum(per_seq)
    if reduction == "mean":
        return jnp.mean(per_seq)
    raise ValueError(f"bad reduction {reduction}")
