"""CTC-CRF accuracy-parity proxy against the reference's own smoke test.

Port of /root/reference/src/ctc_crf/test/main.py:1-42 run on its
checked-in binary den_lm.fst (read directly with Fst.read_openfst):
identical logits / labels / lambda, with golden values from an
independent numpy forward over the same FST (denominator) and torch's
CTC (numerator) — semantics of ctc_crf/__init__.py:81-83
(cost = den_lld − (1+λ)·ctc_lld).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.fst.fst import Fst
from cat_tpu.fst.graph import DenGraph
from cat_tpu.ops.crf import DenDevice, ctc_crf_loss, den_log_partition

REF_FST = "/root/reference/src/ctc_crf/test/den_lm.fst"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FST), reason="reference checkout not present")

# the reference smoke test's inputs (test/main.py:17-28):
# vocab: 0=<blk> 1=a 2=c 3=s 4=t; labels "cat" = [2, 1, 4]
PROBS = np.asarray([
    [0.1, 0.1, 0.5, 0.1, 0.2],
    [0.5, 0.1, 0.1, 0.2, 0.2],
    [0.1, 0.7, 0.1, 0.05, 0.05],
    [0.6, 0.1, 0.1, 0.1, 0.1],
    [0.1, 0.1, 0.1, 0.6, 0.1],
], np.float32)
LABELS = np.asarray([[2, 1, 4]], np.int32)
LAMB = 0.01


def load_den():
    fst = Fst.read_openfst(REF_FST)
    graph = DenGraph.from_fst(fst)
    return fst, graph, DenDevice.from_graph(graph)


def test_read_openfst_reference_den_lm():
    fst, graph, _ = load_den()
    assert fst.num_states == 9 and fst.start == 0
    assert fst.num_arcs == 24
    # ilabel-1 shift (fst_read.cc:45-62): labels land in [0, 4]
    assert graph.arc_label.min() == 0 and graph.arc_label.max() == 4
    # tropical weights negated into log-probs: all <= 0
    assert graph.arc_weight.max() <= 0.0
    # two final states with weight -log(2)
    fw = graph.final_weights
    finals = np.where(fw > -1e29)[0]
    assert list(finals) == [4, 6]
    np.testing.assert_allclose(fw[finals], -np.log(2.0), rtol=1e-6)


def test_den_partition_matches_numpy_on_reference_fst():
    from test_crf import numpy_den_logz

    _, graph, den = load_den()
    lp = np.log(PROBS)[None]
    logz = den_log_partition(jnp.asarray(lp), jnp.asarray([5]), den)
    ref = numpy_den_logz(graph, lp[0], 5)
    np.testing.assert_allclose(float(logz[0]), ref, rtol=1e-5)
    # shorter length uses only the first frames
    logz3 = den_log_partition(jnp.asarray(lp), jnp.asarray([3]), den)
    ref3 = numpy_den_logz(graph, lp[0], 3)
    np.testing.assert_allclose(float(logz3[0]), ref3, rtol=1e-5)


def test_ctc_crf_loss_reference_smoke_golden():
    """cost = den_lld − (1+λ)·ctc_lld on the reference's exact inputs,
    golden-checked against numpy(den) + torch(ctc)."""
    torch = pytest.importorskip("torch")
    from test_crf import numpy_den_logz

    _, graph, den = load_den()
    lp = np.log(PROBS)[None]
    flens = np.asarray([5], np.int32)
    llens = np.asarray([3], np.int32)

    loss = ctc_crf_loss(jnp.asarray(lp), jnp.asarray(LABELS),
                        jnp.asarray(flens), jnp.asarray(llens), den,
                        lamb=LAMB)

    ctc_ref = torch.nn.functional.ctc_loss(
        torch.from_numpy(lp[0])[:, None, :],  # (T, N, V) log-probs
        torch.from_numpy(LABELS.astype(np.int64)),
        torch.from_numpy(flens.astype(np.int64)),
        torch.from_numpy(llens.astype(np.int64)),
        blank=0, reduction="none").item()
    den_ref = numpy_den_logz(graph, lp[0], 5)
    golden = den_ref + (1.0 + LAMB) * ctc_ref
    np.testing.assert_allclose(float(loss), golden, rtol=1e-5)

    # gradients exist and are finite on the same inputs (the reference
    # test's backward() check, main.py:37)
    g = jax.grad(lambda x: ctc_crf_loss(
        x, jnp.asarray(LABELS), jnp.asarray(flens), jnp.asarray(llens),
        den, lamb=LAMB))(jnp.asarray(lp))
    assert np.all(np.isfinite(np.asarray(g)))
    # d(cost)/d(logp) sums to ~ 1 - (1+λ) per frame: den posteriors sum
    # to 1 and the CTC term contributes -(1+λ) (grad of nll wrt logp
    # rows sums to -1 for valid frames)
    row = np.asarray(g)[0].sum(axis=-1)
    np.testing.assert_allclose(row, np.full((5,), -LAMB), atol=1e-4)
