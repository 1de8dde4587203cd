"""Tests for the CTC-CRF denominator log-partition and combined loss."""
import math

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.fst.fst import Fst, compose, rm_epsilon
from cat_tpu.fst.graph import DenGraph, build_den_fst, ctc_topo
from cat_tpu.fst.ngram import train_ngram
from cat_tpu.ops.crf import DenDevice, ctc_crf_loss, den_log_partition


def free_den_graph(V):
    """ctc_topo composed with a weight-0 accept-all G."""
    T = ctc_topo(V)
    G = Fst()
    s = G.add_state()
    G.start = s
    G.set_final(s, 0.0)
    for p in range(1, V):
        G.add_arc(s, s, p, p, 0.0)
    return DenGraph.from_fst(rm_epsilon(compose(T, G)))


def test_den_partition_free_lm_is_zero():
    """With a flat LM, logZ over log-softmax inputs == 0 exactly (the CTC
    topology is input-deterministic: paths <-> all V^T label sequences)."""
    V, N, T = 4, 3, 12
    den = DenDevice.from_graph(free_den_graph(V))
    rng = np.random.default_rng(0)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((N, T, V)).astype(np.float32)),
        axis=-1))
    il = np.array([T, T - 3, T - 5], np.int32)
    logz = jax.jit(lambda x, l: den_log_partition(x, l, den))(
        jnp.asarray(lp), jnp.asarray(il))
    np.testing.assert_allclose(np.asarray(logz), 0.0, atol=1e-4)


def test_den_partition_free_lm_gradient_is_posterior():
    """d logZ / d y[t,v] == softmax posterior == exp(y) for the flat LM."""
    V, N, T = 3, 2, 8
    den = DenDevice.from_graph(free_den_graph(V))
    rng = np.random.default_rng(1)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((N, T, V)).astype(np.float32)),
        axis=-1))
    il = np.array([T, T - 2], np.int32)
    f = jax.jit(lambda x: jnp.sum(den_log_partition(x, jnp.asarray(il),
                                                    den)))
    g = np.asarray(jax.grad(f)(jnp.asarray(lp)))
    for n in range(N):
        np.testing.assert_allclose(g[n, :il[n]], np.exp(lp[n, :il[n]]),
                                   atol=1e-4)
        np.testing.assert_allclose(g[n, il[n]:], 0.0)


def numpy_den_logz(graph: DenGraph, y, T):
    """Naive forward over the arc table for one sequence."""
    NEG = -1e30
    Q = graph.num_states
    alpha = graph.start_weights.astype(np.float64).copy()
    for t in range(T):
        nxt = np.full(Q, NEG)
        for a in range(len(graph.arc_src)):
            s, d = graph.arc_src[a], graph.arc_dst[a]
            v = graph.arc_label[a]
            val = alpha[s] + graph.arc_weight[a] + y[t, v]
            if val > NEG / 2:
                m = max(nxt[d], val)
                nxt[d] = m + np.log(np.exp(nxt[d] - m) + np.exp(val - m))
        alpha = nxt
    tot = NEG
    for q in range(Q):
        if graph.final_weights[q] > NEG / 2:
            val = alpha[q] + graph.final_weights[q]
            m = max(tot, val)
            tot = m + np.log(np.exp(tot - m) + np.exp(val - m))
    return tot


def test_den_partition_matches_numpy_with_real_lm():
    corpus = [[1, 2, 1], [1, 1, 2], [2, 1], [1, 2], [2, 2, 1], [1, 2, 2]]
    lm = train_ngram(corpus, order=2)
    V = 3
    graph = DenGraph.from_fst(build_den_fst(lm, num_classes=V))
    den = DenDevice.from_graph(graph)
    rng = np.random.default_rng(2)
    N, T = 2, 6
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((N, T, V)).astype(np.float32)),
        axis=-1))
    il = np.array([T, T - 2], np.int32)
    logz = np.asarray(jax.jit(
        lambda x, l: den_log_partition(x, l, den))(jnp.asarray(lp),
                                                   jnp.asarray(il)))
    for n in range(N):
        ref = numpy_den_logz(graph, lp[n], int(il[n]))
        assert abs(logz[n] - ref) < 1e-3, (n, logz[n], ref)


def test_den_partition_grad_finite_diff():
    corpus = [[1, 2], [2, 1], [1, 1, 2], [2, 2]]
    lm = train_ngram(corpus, order=2)
    V = 3
    den = DenDevice.from_graph(DenGraph.from_fst(
        build_den_fst(lm, num_classes=V)))
    rng = np.random.default_rng(3)
    N, T = 2, 5
    lp = rng.standard_normal((N, T, V)).astype(np.float32)
    il = np.array([T, T - 1], np.int32)
    f = jax.jit(lambda x: jnp.sum(den_log_partition(x, jnp.asarray(il),
                                                    den)))
    g = np.asarray(jax.grad(f)(jnp.asarray(lp)))
    base = float(f(jnp.asarray(lp)))
    eps = 1e-3
    rng2 = np.random.default_rng(4)
    for _ in range(10):
        n = rng2.integers(0, N)
        t = rng2.integers(0, il[n])
        v = rng2.integers(0, V)
        lp2 = lp.copy()
        lp2[n, t, v] += eps
        fd = (float(f(jnp.asarray(lp2))) - base) / eps
        assert abs(fd - g[n, t, v]) < 5e-2, (n, t, v, fd, g[n, t, v])


def test_ctc_crf_loss_end_to_end():
    corpus = [[1, 2, 1], [2, 1], [1, 2]]
    lm = train_ngram(corpus, order=2)
    V = 3
    den = DenDevice.from_graph(DenGraph.from_fst(
        build_den_fst(lm, num_classes=V)))
    rng = np.random.default_rng(5)
    N, T, U = 2, 10, 3
    logits = rng.standard_normal((N, T, V)).astype(np.float32)
    labels = np.array([[1, 2, 1], [2, 1, 0]], np.int32)
    il = np.array([T, T - 2], np.int32)
    ul = np.array([3, 2], np.int32)

    def loss_fn(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return ctc_crf_loss(lp, jnp.asarray(labels), jnp.asarray(il),
                            jnp.asarray(ul), den, lamb=0.1)

    loss, g = jax.jit(jax.value_and_grad(loss_fn))(jnp.asarray(logits))
    assert np.isfinite(float(loss))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # padded frames have zero grad
    np.testing.assert_allclose(g[1, il[1]:], 0.0, atol=1e-6)
    # training signal sanity: a gradient step reduces the loss
    loss2 = jax.jit(loss_fn)(jnp.asarray(logits - 0.5 * g))
    assert float(loss2) < float(loss)
