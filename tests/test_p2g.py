"""Tests for LLM-P2G (cat_tpu/p2g): seq2seq, DANP, TKM marginalization."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cat_tpu.p2g import (P2GSeq2Seq, danp_expand, greedy_generate,
                         make_train_step, marginalized_rescore, seq_logp,
                         tkm_loss)
from cat_tpu.utils.manager import TrainState

V_P, V_G, T, U, N = 10, 10, 8, 8, 16
EOS = 1


def tiny_model():
    return P2GSeq2Seq(src_vocab=V_P, tgt_vocab=V_G, hdim=32,
                      enc_layers=1, dec_layers=1, num_heads=2,
                      ff_dim=64, dropout_rate=0.0)


def make_batch(rng, n=N):
    """Task: copy source (plus eos). Learnable by cross-attention."""
    src = rng.integers(2, V_P, (n, T)).astype(np.int32)
    src_lens = np.full((n,), T, np.int32)
    tgt = np.concatenate([src[:, :U - 1], np.full((n, 1), EOS)], 1)
    tgt_in = np.concatenate([np.zeros((n, 1), np.int32), tgt[:, :-1]], 1)
    return {"src": jnp.asarray(src), "src_lens": jnp.asarray(src_lens),
            "tgt_in": jnp.asarray(tgt_in), "tgt_out": jnp.asarray(tgt),
            "tgt_lens": jnp.asarray(np.full((n,), U, np.int32)),
            "weight": jnp.ones((n,), jnp.float32)}


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    model = tiny_model()
    b0 = make_batch(rng)
    # state.params holds BARE params (framework convention); functions
    # taking `params` below expect the full {"params": ...} variables
    params = jax.jit(model.init)(jax.random.PRNGKey(0), b0["src"],
                                 b0["src_lens"], b0["tgt_in"],
                                 b0["tgt_lens"])["params"]
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=3e-3)
    state = TrainState(params=params, batch_stats={},
                       opt_state=tx.init(params), step=jnp.asarray(0))
    step = make_train_step(model, tx, mode="ce")
    losses = []
    for i in range(150):
        batch = make_batch(rng)
        state, m = step(state, batch, jnp.float32(3e-3),
                        jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    return model, state


def test_ce_training_learns_copy(trained):
    model, state = trained
    rng = np.random.default_rng(99)
    b = make_batch(rng, n=8)
    toks, lens = greedy_generate(model, {"params": state.params}, b["src"],
                                 b["src_lens"], bos=0, eos=EOS,
                                 max_len=U)
    toks = np.asarray(toks)
    ref = np.asarray(b["tgt_out"])
    # most rows should reproduce the copy task
    row_ok = [(toks[i, :U - 1] == ref[i, :U - 1]).mean() > 0.8
              for i in range(8)]
    assert sum(row_ok) >= 6, toks


def test_tkm_equals_ce_for_k1(trained):
    model, state = trained
    rng = np.random.default_rng(5)
    b = make_batch(rng, n=4)
    logits = model.apply({"params": state.params}, b["src"], b["src_lens"],
                         b["tgt_in"], b["tgt_lens"])
    ce = -seq_logp(logits, b["tgt_out"], b["tgt_lens"])
    nll = tkm_loss(model, {"params": state.params}, b["src"][:, None],
                   b["src_lens"][:, None],
                   jnp.zeros((4, 1)), b["tgt_in"], b["tgt_out"],
                   b["tgt_lens"])
    assert np.allclose(np.asarray(ce), np.asarray(nll), atol=1e-4)


def test_tkm_marginalizes_over_candidates(trained):
    model, state = trained
    rng = np.random.default_rng(6)
    b = make_batch(rng, n=4)
    # two candidates: the true source and a corrupted one, equal weight
    corrupt = jnp.asarray(
        rng.integers(2, V_P, (4, T)).astype(np.int32))
    cands = jnp.stack([b["src"], corrupt], axis=1)
    clens = jnp.stack([b["src_lens"], b["src_lens"]], axis=1)
    scores = jnp.zeros((4, 2))
    nll_m = tkm_loss(model, {"params": state.params}, cands, clens, scores,
                     b["tgt_in"], b["tgt_out"], b["tgt_lens"])
    logits = model.apply({"params": state.params}, b["src"], b["src_lens"],
                         b["tgt_in"], b["tgt_lens"])
    nll_true = -seq_logp(logits, b["tgt_out"], b["tgt_lens"])
    # marginal ≥ p(y|x_true)/2 → nll_m ≤ nll_true + log 2; and the
    # marginal can't beat the max single-candidate likelihood by much
    assert np.all(np.asarray(nll_m) <= np.asarray(nll_true)
                  + np.log(2) + 1e-4)


def test_tkm_train_step_runs(trained):
    model, _ = trained
    rng = np.random.default_rng(7)
    b = make_batch(rng, n=4)
    cands = jnp.stack([b["src"], b["src"]], axis=1)
    clens = jnp.stack([b["src_lens"], b["src_lens"]], axis=1)
    batch = {"cands": cands, "cand_lens": clens,
             "cand_scores": jnp.asarray([[0.0, -1.0]] * 4),
             "tgt_in": b["tgt_in"], "tgt_out": b["tgt_out"],
             "tgt_lens": b["tgt_lens"], "weight": b["weight"][:4]}
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), b["src"],
                                 b["src_lens"], b["tgt_in"],
                                 b["tgt_lens"])["params"]
    state = TrainState(params=params, batch_stats={},
                       opt_state=tx.init(params), step=jnp.asarray(0))
    step = make_train_step(model, tx, mode="tkm", t_weight=1.5)
    state2, m = step(state, batch, jnp.float32(1e-3),
                     jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1


def test_danp_expand():
    utts = [("u1", [1, 2]), ("u2", [3])]
    nbest = {"u1": [(-1.0, [5, 6]), (-2.0, [5, 7]), (-3.0, [8])],
             "u2": [(-0.5, [9])]}
    out = danp_expand(utts, nbest, k=2)
    assert len(out) == 3  # 2 for u1 (top-2), 1 for u2
    assert out[0] == ("u1", [5, 6], [1, 2])


def test_marginalized_rescore_prefers_truth(trained):
    model, state = trained
    rng = np.random.default_rng(8)
    b = make_batch(rng, n=4)
    wrong = jnp.asarray(rng.integers(2, V_G, (4, U)).astype(np.int32))
    hyps = jnp.stack([b["tgt_out"], wrong], axis=1)
    hyp_lens = jnp.stack([b["tgt_lens"], b["tgt_lens"]], axis=1)
    scores = marginalized_rescore(
        model, {"params": state.params}, b["src"][:, None], b["src_lens"][:, None],
        jnp.zeros((4, 1)), hyps, hyp_lens, bos=0)
    s = np.asarray(scores)
    assert (s[:, 0] > s[:, 1]).mean() >= 0.75
