"""RNA/CTC-T monotonic transducer loss vs brute-force enumeration."""
import itertools
import math

import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.ops.rnnt_rna import rnnt_loss_rna


def brute_force_rna(lp, labels, T, U, blank=0):
    """Sum over monotonic paths: binary choice per frame (blank or next
    label), exactly U label emissions in T frames."""
    total = -1e30
    for positions in itertools.combinations(range(T), U):
        u = 0
        w = 0.0
        for t in range(T):
            if u < U and t == positions[u]:
                w += lp[t, u, labels[u]]
                u += 1
            else:
                w += lp[t, u, blank]
        m = max(total, w)
        total = m + math.log(math.exp(total - m) + math.exp(w - m))
    return -total


def test_rna_matches_bruteforce():
    rng = np.random.default_rng(0)
    N, T, U, V = 3, 6, 3, 5
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((N, T, U + 1, V)).astype(np.float32)),
        axis=-1))
    labels = rng.integers(1, V, size=(N, U)).astype(np.int32)
    il = np.array([6, 5, 4], np.int32)
    ul = np.array([3, 2, 2], np.int32)
    nll = np.asarray(jax.jit(lambda *a: rnnt_loss_rna(
        *a, reduction="none"))(jnp.asarray(lp), jnp.asarray(labels),
                               jnp.asarray(il), jnp.asarray(ul)))
    for n in range(N):
        ref = brute_force_rna(lp[n], labels[n], int(il[n]), int(ul[n]))
        assert abs(nll[n] - ref) < 1e-3, (n, nll[n], ref)


def test_rna_grads_finite_and_train():
    rng = np.random.default_rng(1)
    N, T, U, V = 2, 8, 3, 4
    logits = rng.standard_normal((N, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(N, U)).astype(np.int32)
    il = np.full((N,), T, np.int32)
    ul = np.full((N,), U, np.int32)

    def f(x):
        return rnnt_loss_rna(jax.nn.log_softmax(x, -1),
                             jnp.asarray(labels), jnp.asarray(il),
                             jnp.asarray(ul))

    vg = jax.jit(jax.value_and_grad(f))
    x = jnp.asarray(logits)
    l0, g = vg(x)
    assert np.all(np.isfinite(np.asarray(g)))
    for _ in range(25):
        l, g = vg(x)
        x = x - 0.5 * g
    assert float(l) < float(l0)
