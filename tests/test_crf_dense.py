"""Exactness tests for the dense MXU n-gram denominator."""
import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.fst.graph import DenGraph, build_den_fst
from cat_tpu.fst.ngram import train_ngram
from cat_tpu.ops.crf import DenDevice, den_log_partition
from cat_tpu.ops.crf_dense import (DenseDen, ctc_crf_loss_dense,
                                   dense_den_log_partition)

LN10 = math.log(10.0)


def brute_force_logz(lm, lp, T, V):
    """Z = sum over label sequences s of P_lm(s) * sum over CTC
    alignments collapsing to s of prod_t exp(lp[t, pi_t])."""
    total = -1e30
    for ali in itertools.product(range(V), repeat=T):
        seq, prev = [], -1
        for s in ali:
            if s != prev and s != 0:
                seq.append(s)
            prev = s
        am = sum(lp[t, ali[t]] for t in range(T))
        lm_score = lm.score_sentence(seq) * LN10
        w = am + lm_score
        m = max(total, w)
        total = m + np.log(np.exp(total - m) + np.exp(w - m))
    return total


def make_lm(order=2, V=3, full_coverage=False):
    rng = np.random.default_rng(0)
    if full_coverage:
        # every bigram appears → backoff arcs never fire in the FST path
        corpus = [list(p) for p in
                  itertools.product(range(1, V), repeat=2)] * 3
        corpus += [[a] for a in range(1, V)]
    else:
        corpus = [list(rng.integers(1, V, size=int(rng.integers(2, 5))))
                  for _ in range(12)]
    return train_ngram(corpus, order=order)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dense_den_matches_bruteforce(order):
    V, N, T = 3, 2, 4
    lm = make_lm(order=order, V=V)
    den = DenseDen.from_ngram(lm, num_classes=V)
    rng = np.random.default_rng(1)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((N, T, V)).astype(np.float32)),
        axis=-1))
    il = np.array([T, T - 1], np.int32)
    logz = np.asarray(jax.jit(
        lambda x, l: dense_den_log_partition(x, l, den))(
            jnp.asarray(lp), jnp.asarray(il)))
    for n in range(N):
        ref = brute_force_logz(lm, lp[n], int(il[n]), V)
        assert abs(logz[n] - ref) < 1e-3, (n, logz[n], ref)


def test_dense_matches_arc_table_when_no_backoff():
    """With full bigram coverage AND backoff weights stripped, the FST
    path has no epsilon arcs at all, so both formulations must agree
    (in general the eps-backoff graph overcounts and the dense
    expansion is the exact one)."""
    V = 3
    lm = make_lm(order=2, V=V, full_coverage=True)
    lm.bows = [dict() for _ in range(lm.order)]  # strip backoff arcs
    dense = DenseDen.from_ngram(lm, num_classes=V)
    arc = DenDevice.from_graph(
        DenGraph.from_fst(build_den_fst(lm, num_classes=V)))
    rng = np.random.default_rng(2)
    N, T = 2, 6
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((N, T, V)).astype(np.float32)),
        axis=-1))
    il = np.array([T, T - 2], np.int32)
    z_dense = np.asarray(jax.jit(
        lambda x, l: dense_den_log_partition(x, l, dense))(
            jnp.asarray(lp), jnp.asarray(il)))
    z_arc = np.asarray(jax.jit(
        lambda x, l: den_log_partition(x, l, arc))(
            jnp.asarray(lp), jnp.asarray(il)))
    np.testing.assert_allclose(z_dense, z_arc, atol=8e-3)


def test_dense_den_grad_finite_diff():
    V, N, T = 3, 2, 5
    lm = make_lm(order=2, V=V)
    den = DenseDen.from_ngram(lm, num_classes=V)
    rng = np.random.default_rng(3)
    lp = rng.standard_normal((N, T, V)).astype(np.float32)
    il = np.array([T, T - 1], np.int32)
    f = jax.jit(lambda x: jnp.sum(
        dense_den_log_partition(x, jnp.asarray(il), den)))
    g = np.asarray(jax.grad(f)(jnp.asarray(lp)))
    assert np.all(np.isfinite(g))
    base = float(f(jnp.asarray(lp)))
    eps = 1e-3
    rng2 = np.random.default_rng(4)
    for _ in range(12):
        n = int(rng2.integers(0, N))
        t = int(rng2.integers(0, il[n]))
        v = int(rng2.integers(0, V))
        lp2 = lp.copy()
        lp2[n, t, v] += eps
        fd = (float(f(jnp.asarray(lp2))) - base) / eps
        assert abs(fd - g[n, t, v]) < 5e-2, (n, t, v, fd, g[n, t, v])
    # padded frames zero grad
    np.testing.assert_allclose(g[1, il[1]:], 0.0)


def test_dense_crf_loss_trains():
    V = 4
    lm = make_lm(order=2, V=V)
    den = DenseDen.from_ngram(lm, num_classes=V)
    rng = np.random.default_rng(5)
    N, T = 4, 12
    logits = rng.standard_normal((N, T, V)).astype(np.float32)
    labels = np.array([[1, 2, 1], [2, 1, 0], [3, 2, 0], [1, 0, 0]],
                      np.int32)
    il = np.full((N,), T, np.int32)
    ul = np.array([3, 2, 2, 1], np.int32)

    def loss_fn(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return ctc_crf_loss_dense(lp, jnp.asarray(labels),
                                  jnp.asarray(il), jnp.asarray(ul), den)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    x = jnp.asarray(logits)
    l0, g0 = vg(x)
    for _ in range(20):
        l, g = vg(x)
        x = x - 0.5 * g
    assert float(l) < float(l0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_dense_den_grad_matches_graph_bruteforce_order3():
    """Exact occupancy gradient vs f64 forward-backward over the
    explicit {post-blank, in-phone} x (a, b) state graph, with an
    ORDER-3 LM (round-1's finite-diff test only covered order 2, and
    f32 forward differences at eps=1e-3 proved too noisy to
    distinguish a real gradient bug from evaluation noise)."""
    import math

    from cat_tpu.fst.ngram import train_ngram

    V = 3
    corpus = [[1], [2], [1, 2], [2, 2], [1, 1], [2, 1], [2, 2, 2],
              [1, 2, 1]]
    lm = train_ngram([list(s) for s in corpus], order=3)
    den = DenseDen.from_ngram(lm, num_classes=V)
    logw = np.asarray(den.logw, np.float64)
    final = np.asarray(den.final, np.float64)

    rng = np.random.default_rng(0)
    T = 6
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, T, V)).astype(np.float32)),
        -1), np.float64)
    lens = [6, 4]

    def brute(lp_n, T_n):
        NEG = -np.inf
        all_states = [(ph, a, b) for ph in ("bl", "in")
                      for a in range(V) for b in range(V)]
        idx = {s: i for i, s in enumerate(all_states)}
        S = len(all_states)
        trans = []
        for a in range(V):
            for b in range(V):
                i_bl, i_in = idx[("bl", a, b)], idx[("in", a, b)]
                trans.append((i_bl, i_bl, 0, 0.0))
                trans.append((i_in, i_bl, 0, 0.0))
                if b != 0:
                    trans.append((i_in, i_in, b, 0.0))
                for u in range(1, V):
                    w = logw[a, b, u]
                    if w < -1e20:
                        continue
                    j = idx[("in", b, u)]
                    trans.append((i_bl, j, u, w))
                    if u != b:
                        trans.append((i_in, j, u, w))
        alpha = np.full((T_n + 1, S), NEG)
        alpha[0, idx[("bl", 0, 0)]] = 0.0
        for t in range(T_n):
            for (i, j, v, w) in trans:
                if alpha[t, i] == NEG:
                    continue
                alpha[t + 1, j] = np.logaddexp(
                    alpha[t + 1, j], alpha[t, i] + w + lp_n[t, v])
        fin = np.array([final[a, b] if final[a, b] > -1e20 else NEG
                        for (_, a, b) in all_states])
        logz = np.logaddexp.reduce(alpha[T_n] + fin)
        beta = np.full((T_n + 1, S), NEG)
        beta[T_n] = fin
        for t in range(T_n - 1, -1, -1):
            for (i, j, v, w) in trans:
                if beta[t + 1, j] == NEG:
                    continue
                beta[t, i] = np.logaddexp(
                    beta[t, i], w + lp_n[t, v] + beta[t + 1, j])
        g = np.zeros((T_n, V))
        for t in range(T_n):
            for (i, j, v, w) in trans:
                if alpha[t, i] == NEG or beta[t + 1, j] == NEG:
                    continue
                g[t, v] += math.exp(alpha[t, i] + w + lp_n[t, v]
                                    + beta[t + 1, j] - logz)
        return logz, g

    f = jax.jit(lambda x: jnp.sum(dense_den_log_partition(
        x, jnp.asarray(lens, np.int32), den)))
    g_vjp = np.asarray(jax.grad(f)(jnp.asarray(lp, np.float32)))
    for n in range(2):
        lz, g = brute(lp[n], lens[n])
        np.testing.assert_allclose(g_vjp[n][: lens[n]], g, rtol=5e-3,
                                   atol=5e-4)
        # occupancies are a per-frame distribution
        np.testing.assert_allclose(g_vjp[n][: lens[n]].sum(-1), 1.0,
                                   atol=1e-3)
        np.testing.assert_allclose(g_vjp[n][lens[n]:], 0.0)
