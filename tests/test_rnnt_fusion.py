"""RNN-T decode options: shallow fusion, ILM subtraction, LODR."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.fst.ngram import train_ngram
from cat_tpu.rnnt import train as rnnt_train
from cat_tpu.rnnt.decode import CombinedLM, RNNTBeamDecoder

CFG = {
    "encoder": {"type": "LSTM",
                "kwargs": {"hdim": 12, "num_layers": 1,
                           "bidirectional": True, "dropout_rate": 0.0}},
    "predictor": {"type": "LSTMPredictor",
                  "kwargs": {"hdim": 8, "num_layers": 1}},
    "joiner": {"type": "JointNet", "kwargs": {"hdim": 8,
                                              "join_mode": "add"}},
}
V = 4


def setup_model():
    model = rnnt_train.build_model(CFG, num_classes=V)
    from cat_tpu.utils.scheduler import build_scheduler

    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 1000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = rnnt_train.init_state(model, tx, feat_dim=5)
    return model, state


def test_combined_lm_lodr_weights():
    c1 = train_ngram([[1, 2], [1, 2, 3]] * 4, order=2)
    c2 = train_ngram([[3, 3], [3, 1]] * 4, order=2)
    comb = CombinedLM([(c1, 1.0), (c2, -0.4)])
    v = comb.logp((1,), 2)
    assert abs(v - (c1.logp((1,), 2) - 0.4 * c2.logp((1,), 2))) < 1e-9


def test_fusion_and_ilm_change_results():
    rng = np.random.default_rng(0)
    model, state = setup_model()
    feats = rng.standard_normal((2, 10, 5)).astype(np.float32)
    flens = np.array([10, 8], np.int32)

    base = RNNTBeamDecoder(model, state.params, beam_width=3)
    res_base = base.decode(feats, flens)

    lm = train_ngram([[1, 1, 1], [1, 1]] * 5, order=2)
    fused = RNNTBeamDecoder(model, state.params, beam_width=3,
                            lm=lm, alpha=5.0)
    res_fused = fused.decode(feats, flens)
    # heavy LM pushes hypotheses toward token 1 (or at least changes
    # scores)
    assert (res_base[0][0][1] != res_fused[0][0][1]
            or abs(res_base[0][0][0] - res_fused[0][0][0]) > 1e-6)

    ilm = RNNTBeamDecoder(model, state.params, beam_width=3,
                          ilm_weight=0.5)
    res_ilm = ilm.decode(feats, flens)
    assert res_ilm[0]  # runs and returns ranked hypotheses
    scores = [s for s, _ in res_ilm[0]]
    assert scores == sorted(scores, reverse=True)
