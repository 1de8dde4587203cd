"""Golden tests for cat_tpu.ops.rnnt against a naive numpy DP and
finite-difference gradients."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.rnnt import rnnt_loss


def numpy_rnnt_nll(log_probs, labels, T, U, blank=0):
    """Naive log-domain transducer forward for one sequence.

    log_probs: (Tmax, U1max, V); labels: (Umax,)
    """
    NEG = -1e30

    def lae(a, b):
        m = max(a, b)
        if m <= NEG / 2:
            return NEG
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    alpha = np.full((T, U + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            terms = NEG
            if t > 0:
                terms = lae(terms, alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                terms = lae(terms,
                            alpha[t, u - 1]
                            + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = terms
    return -(alpha[T - 1, U] + log_probs[T - 1, U, blank])


def make_batch(rng, N=3, T=12, V=8, U=5):
    logits = rng.standard_normal((N, T, U + 1, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = rng.integers(1, V, size=(N, U)).astype(np.int32)
    il = rng.integers(max(2, T // 2), T + 1, size=(N,)).astype(np.int32)
    il[0] = T
    ul = rng.integers(1, U + 1, size=(N,)).astype(np.int32)
    ul[0] = U
    return lp, labels, il, ul


def test_rnnt_matches_numpy():
    rng = np.random.default_rng(0)
    lp, labels, il, ul = make_batch(rng)
    nll = np.asarray(jax.jit(lambda *a: rnnt_loss(*a, reduction="none"))(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il),
        jnp.asarray(ul)))
    for n in range(lp.shape[0]):
        ref = numpy_rnnt_nll(lp[n], labels[n], int(il[n]), int(ul[n]))
        assert abs(nll[n] - ref) < 1e-3, (n, nll[n], ref)


def test_rnnt_grad_finite_diff():
    rng = np.random.default_rng(1)
    lp, labels, il, ul = make_batch(rng, N=2, T=6, V=5, U=3)
    lp_j = jnp.asarray(lp)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ul))
    f = lambda x: rnnt_loss(x, *args, reduction="sum")
    g = np.asarray(jax.grad(f)(lp_j))
    assert np.all(np.isfinite(g))

    # finite differences at a handful of positions
    eps = 1e-3
    base = float(f(lp_j))
    rng2 = np.random.default_rng(2)
    for _ in range(12):
        n = rng2.integers(0, lp.shape[0])
        t = rng2.integers(0, il[n])
        u = rng2.integers(0, ul[n] + 1)
        v = rng2.integers(0, lp.shape[3])
        lp2 = lp.copy()
        lp2[n, t, u, v] += eps
        fd = (float(f(jnp.asarray(lp2))) - base) / eps
        assert abs(fd - g[n, t, u, v]) < 5e-2, (n, t, u, v, fd, g[n, t, u, v])


def test_rnnt_jit_and_masks():
    rng = np.random.default_rng(3)
    lp, labels, il, ul = make_batch(rng, N=4, T=10, V=6, U=4)
    fn = jax.jit(lambda *a: rnnt_loss(*a, reduction="none"))
    nll = np.asarray(fn(jnp.asarray(lp), jnp.asarray(labels),
                        jnp.asarray(il), jnp.asarray(ul)))
    assert np.all(np.isfinite(nll)) and np.all(nll > 0)
    # grads vanish on padded frames
    f = jax.jit(lambda x: rnnt_loss(x, jnp.asarray(labels), jnp.asarray(il),
                                    jnp.asarray(ul), reduction="sum"))
    g = np.asarray(jax.grad(f)(jnp.asarray(lp)))
    for n in range(4):
        np.testing.assert_allclose(g[n, il[n]:], 0.0)
        np.testing.assert_allclose(g[n, :, ul[n] + 1:], 0.0)
