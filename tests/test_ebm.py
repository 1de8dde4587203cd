"""EBM/TRF LM with NCE: training separates data from noise."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cat_tpu.fst.ngram import train_ngram
from cat_tpu.lm.ebm import (EnergyLM, make_nce_loss, pad_token_batch,
                            sample_from_ngram)


def test_ngram_sampler():
    corpus = [[1, 2, 3], [1, 2], [2, 3], [1, 2, 3, 1]] * 3
    lm = train_ngram(corpus, order=2)
    seqs, lps = sample_from_ngram(lm, 20, max_len=10, seed=0)
    assert len(seqs) == 20
    assert all(isinstance(lp, float) or np.isfinite(lp) for lp in lps)
    # samples should mostly start with 1 (corpus statistics)
    starts = [s[0] for s in seqs if s]
    assert starts.count(1) > len(starts) // 3


def test_nce_training_separates():
    rng = np.random.default_rng(0)
    V = 8
    # data: strongly patterned sequences (ascending runs)
    data = []
    for _ in range(64):
        start = int(rng.integers(1, 4))
        L = int(rng.integers(3, 7))
        data.append([(start + k - 1) % (V - 1) + 1 for k in range(L)])
    noise_lm = train_ngram([[int(x) for x in rng.integers(1, V, 5)]
                            for _ in range(50)], order=1)
    noise, noise_lp10 = sample_from_ngram(noise_lm, 64, max_len=8,
                                          seed=1)
    noise = [[int(w) for w in s] for s in noise]

    model = EnergyLM(vocab_size=V, hdim=16, num_layers=1, max_len=16)
    U = 10
    dt, dl = pad_token_batch(data, {}, U)
    nt, nl = pad_token_batch(noise, {}, U)
    import math
    LN10 = math.log(10.0)
    d_nlp = np.asarray([noise_lm.score_sentence(s) * LN10 for s in data])
    n_nlp = noise_lp10 * LN10
    batch = dict(
        data_tokens=jnp.asarray(dt), data_lengths=jnp.asarray(dl),
        data_noise_logp=jnp.asarray(d_nlp.astype(np.float32)),
        noise_tokens=jnp.asarray(nt), noise_lengths=jnp.asarray(nl),
        noise_noise_logp=jnp.asarray(n_nlp.astype(np.float32)))

    params = jax.jit(lambda k: model.init(
        k, batch["data_tokens"], batch["data_lengths"]))(
            jax.random.PRNGKey(0))["params"]
    loss_fn = make_nce_loss(model, nu=1.0)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, acc), g = jax.value_and_grad(
            lambda p: loss_fn(p, batch), has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss, acc

    _, _, loss0, acc0 = step(params, opt)
    for _ in range(150):
        params, opt, loss, acc = step(params, opt)
    assert float(loss) < float(loss0)
    assert float(acc) > 0.75, float(acc)
