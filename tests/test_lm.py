"""Tests for the LM task: training reduces ppl, rescoring works."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.lm import train as lm_train
from cat_tpu.lm.rescore import (ngram_nll, rescore_nbest,
                                search_lm_weight)
from cat_tpu.fst.ngram import train_ngram
from cat_tpu.utils.data import CorpusDataset, pack_corpus
from cat_tpu.utils.scheduler import build_scheduler


def make_corpus(tmp_path, n=60, V=12):
    rng = np.random.default_rng(0)
    # markov-ish data: token i tends to be followed by (i+1) % V
    seqs = []
    for _ in range(n):
        L = int(rng.integers(4, 12))
        s = [int(rng.integers(1, V))]
        for _ in range(L - 1):
            if rng.random() < 0.8:
                s.append(1 + (s[-1] % (V - 1)))
            else:
                s.append(int(rng.integers(1, V)))
        seqs.append(s)
    pack_corpus(str(tmp_path / "corpus"), seqs)
    return CorpusDataset(str(tmp_path / "corpus")), seqs, V


def test_lm_training_reduces_ppl(tmp_path):
    ds, seqs, V = make_corpus(tmp_path)
    model = lm_train.build_model(
        {"decoder": {"type": "LSTMPredictor",
                     "kwargs": {"hdim": 32, "num_layers": 1}}},
        num_classes=V)
    sched, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 10000},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}}})
    state = lm_train.init_state(model, tx)
    ppl0 = lm_train.perplexity(model, state.params, seqs[:20])
    step = lm_train.make_train_step(model, tx)
    loader = lm_train.LmLoader(ds, token_budget=400, num_buckets=2)
    key = jax.random.PRNGKey(0)
    for epoch in range(6):
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, jnp.float32(5e-3), sub)
    ppl1 = lm_train.perplexity(model, state.params, seqs[:20])
    assert ppl1 < ppl0 * 0.8, (ppl0, ppl1)
    assert ppl1 < V  # better than uniform


def test_rescore_and_weight_search():
    corpus = [["a", "b", "a", "b"], ["a", "b"], ["a", "b", "a"]] * 5
    lm = train_ngram(corpus, order=2)
    nbest = {
        "u1": {0: (-1.0, "a c"), 1: (-1.2, "a b")},
        "u2": {0: (-0.5, "b a"), 1: (-0.6, "a b a")},
    }
    nll = ngram_nll(lm, nbest)
    # with a strong LM weight, 'a b' should win for u1
    res = rescore_nbest(nbest, nll, alpha=1.0)
    assert res["u1"][1] == "a b"
    refs = {"u1": "a b", "u2": "a b a"}
    found = search_lm_weight(nbest, nll, refs,
                             alphas=[0.0, 0.5, 1.0, 2.0])
    assert found["wer"] <= 25.0
