"""RNN-T task end-to-end: training reduces loss; greedy/beam decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.rnnt import train as rnnt_train
from cat_tpu.rnnt.decode import RNNTBeamDecoder, make_greedy_decoder
from cat_tpu.utils.scheduler import build_scheduler

CFG = {
    "encoder": {"type": "LSTM",
                "kwargs": {"hdim": 24, "num_layers": 1,
                           "bidirectional": True, "dropout_rate": 0.0}},
    "predictor": {"type": "LSTMPredictor",
                  "kwargs": {"hdim": 16, "num_layers": 1}},
    "joiner": {"type": "JointNet", "kwargs": {"hdim": 16,
                                              "join_mode": "add"}},
}
V = 4


def make_batch(rng, N=8, T=24, U=3):
    # word v -> 6 frames of pattern v
    feats = np.zeros((N, T, 6), np.float32)
    labels = np.zeros((N, U), np.int32)
    flens = np.zeros((N,), np.int32)
    llens = np.zeros((N,), np.int32)
    for n in range(N):
        nw = int(rng.integers(1, U + 1))
        t = 0
        for u in range(nw):
            v = int(rng.integers(1, V))
            labels[n, u] = v
            feats[n, t:t + 6, :] = v
            t += 6
            feats[n, t:t + 2, :] = 0  # gap
            t += 2
        feats[n] += rng.standard_normal((T, 6)).astype(np.float32) * 0.1
        flens[n] = min(t, T)
        llens[n] = nw
    return dict(feats=feats, feat_lengths=flens, labels=labels,
                label_lengths=llens, weight=np.ones((N,), np.float32))


def test_rnnt_train_and_decode():
    rng = np.random.default_rng(0)
    model = rnnt_train.build_model(CFG, num_classes=V)
    sched, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 100000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}}})
    state = rnnt_train.init_state(model, tx, feat_dim=6)
    train_step = rnnt_train.make_train_step(model, tx)
    eval_step = rnnt_train.make_eval_step(model)

    batches = [make_batch(rng) for _ in range(4)]
    first = float(eval_step(state, batches[0])["loss_sum"])
    key = jax.random.PRNGKey(0)
    for epoch in range(30):
        for b in batches:
            key, sub = jax.random.split(key)
            state, m = train_step(state, b, jnp.float32(5e-3), sub)
    last = float(eval_step(state, batches[0])["loss_sum"])
    assert last < first * 0.5, (first, last)

    # greedy decoder (single compiled program)
    dec = make_greedy_decoder(model, max_symbols=2, max_out=8)
    b = batches[0]
    tokens, counts = dec(state.params, jnp.asarray(b["feats"]),
                         jnp.asarray(b["feat_lengths"]))
    tokens, counts = np.asarray(tokens), np.asarray(counts)
    # at least half the utterances decode exactly after training
    correct = 0
    for n in range(len(counts)):
        hyp = list(tokens[n, :counts[n]])
        ref = list(b["labels"][n, :b["label_lengths"][n]])
        correct += int(hyp == ref)
    assert correct >= len(counts) // 2, (correct, len(counts))

    # beam decoder agrees with greedy on the best path for most utts
    beam = RNNTBeamDecoder(model, state.params, beam_width=4)
    res = beam.decode(b["feats"][:4], b["feat_lengths"][:4])
    agree = 0
    for n in range(4):
        hyp_beam = res[n][0][1]
        hyp_greedy = list(tokens[n, :counts[n]])
        agree += int(hyp_beam == hyp_greedy)
    assert agree >= 2, res
