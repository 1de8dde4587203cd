"""TRF / dynamic-NCE LM tests (cat_tpu.lm.trf).

Covers the reference depth verdicts: energy-function variants
(model.py:243-317), zeta/pi length handling (model.py:335-374),
on-device noise sampling (model.py:490-570), NCE vs DNCE losses
(model.py:571-704), REBM scoring (model.py:712-735)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.lm.trf import (TRFNCE, hist_length, make_noise_sampler,
                            make_trf_loss, rebm_score, trf_score)

V = 6
MAXLEN = 10


def tiny_model(energy_func="sumtargetlogit"):
    return TRFNCE(
        vocab_size=V,
        ebm={"type": "LSTMPredictor", "kwargs": {"hdim": 16}},
        noise={"type": "LSTMPredictor", "kwargs": {"hdim": 16}},
        energy_func=energy_func, max_len=MAXLEN)


def batch_of(seqs):
    B = len(seqs)
    tokens = np.zeros((B, MAXLEN), np.int32)
    targets = np.zeros((B, MAXLEN), np.int32)
    lens = np.zeros((B,), np.int32)
    for i, s in enumerate(seqs):
        ids = list(s)[: MAXLEN - 1]
        tokens[i, 1: len(ids) + 1] = ids
        targets[i, : len(ids)] = ids
        lens[i] = len(ids) + 1
    return {"tokens": jnp.asarray(tokens), "targets": jnp.asarray(targets),
            "lengths": jnp.asarray(lens)}


def init(model):
    b = batch_of([[1, 2, 3], [4, 5]])
    return model.init(jax.random.PRNGKey(0), b["tokens"], b["targets"],
                      b["lengths"])["params"]


def test_hist_length():
    pi = hist_length(np.asarray([2, 2, 3, 5]), max_len=8)
    assert pi.shape == (8,)
    assert pi[0] == 0.0
    assert pi[2] > pi[3] > pi[4] > 0
    assert abs(pi.sum() - (1.0 - 4.0 / (4 + 8))) < 0.2  # smoothed


@pytest.mark.parametrize("efunc", ["sumtargetlogit", "sumtokenlogit",
                                   "hidden2scalar", "logsumexplogit",
                                   "maxlogit"])
def test_energy_functions(efunc):
    model = tiny_model(efunc)
    params = init(model)
    b = batch_of([[1, 2, 3], [4, 5]])
    e = model.apply({"params": params}, b["tokens"], b["targets"],
                    b["lengths"], method=model.energy)
    assert e.shape == (2,) and np.all(np.isfinite(np.asarray(e)))
    # zeta: phi = -E - zeta[len], zeta[0] == 0 and increasing slope
    zeta = params["zeta"]
    assert float(zeta[0]) == 0.0
    phi = model.apply({"params": params}, b["tokens"], b["targets"],
                      b["lengths"], method=model.phi)
    np.testing.assert_allclose(
        np.asarray(phi), np.asarray(-e - zeta[b["lengths"]]), rtol=1e-5)


def test_noise_sampler_shapes_and_logp():
    model = tiny_model()
    params = init(model)
    pi = hist_length(np.asarray([3, 4, 4, 5]), MAXLEN)
    sampler = make_noise_sampler(model, num=8, max_len=MAXLEN, pi_noise=pi)
    toks, tars, lens, log_pn = jax.jit(sampler)(
        params, jax.random.PRNGKey(1))
    assert toks.shape == (8, MAXLEN) and tars.shape == (8, MAXLEN)
    lens = np.asarray(lens)
    assert np.all((lens >= 1) & (lens < MAXLEN))
    assert np.all(np.asarray(toks)[:, 0] == 0)  # BOS
    assert np.all(np.isfinite(np.asarray(log_pn)))
    # tokens beyond length are zero-padded
    toks = np.asarray(toks)
    for i in range(8):
        assert np.all(toks[i, lens[i]:] == 0)
    # log_pn consistent with the noise model's own scoring + log pi.
    # TRF noise prob counts only the len-1 GENERATED tokens (length is
    # modeled by pi, not an EOS term — model.py:543-568): mask len-1
    # prediction positions.
    nll = model.apply({"params": params}, jnp.asarray(toks), tars,
                      jnp.asarray(lens) - 1, method=model.noise_nll)
    expect = -np.asarray(nll) + np.log(pi[lens] + 1e-30)
    np.testing.assert_allclose(np.asarray(log_pn), expect, rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("method", ["nce", "dnce"])
def test_loss_grads(method):
    model = tiny_model()
    params = init(model)
    pi = hist_length(np.asarray([3, 4, 5]), MAXLEN)
    loss_fn = make_trf_loss(model, pi, method=method, noise_rate=1.0,
                            alpha=0.5, max_len=MAXLEN)
    b = batch_of([[1, 2, 3], [4, 5], [2, 2, 1], [3]])
    (loss, metrics), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(params, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    for k in ("loss_data", "loss_noise", "acc_data", "acc_noise"):
        assert np.isfinite(float(metrics[k])), k
    flat = jax.tree_util.tree_leaves_with_path(grads)
    noise_norm = sum(float(jnp.sum(jnp.abs(g)))
                     for p, g in flat if "noise_model" in str(p))
    trf_norm = sum(float(jnp.sum(jnp.abs(g)))
                   for p, g in flat if "noise_model" not in str(p))
    assert trf_norm > 0
    if method == "nce":
        assert noise_norm == 0.0  # frozen noise model
    else:
        assert noise_norm > 0  # ML term trains the noise model
    # zeta receives gradient (trainable per-length normalization)
    assert float(jnp.sum(jnp.abs(grads["zeta"]))) > 0


def _true_lm_sample(rng, n):
    """Toy language: sentences of token 1 repeated 2-4 times (high
    prob) — everything else is noise."""
    seqs = []
    for _ in range(n):
        L = int(rng.integers(2, 5))
        seqs.append([1] * L)
    return seqs


def _train(method, steps, seed=0):
    import optax

    model = tiny_model()
    params = init(model)
    pi = hist_length(np.asarray([3, 4, 5] * 10), MAXLEN)
    loss_fn = make_trf_loss(model, pi, method=method, noise_rate=1.0,
                            alpha=0.5, max_len=MAXLEN)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, metrics

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    history = []
    for i in range(steps):
        b = batch_of(_true_lm_sample(rng, 16))
        key, sub = jax.random.split(key)
        params, opt, metrics = step(params, opt, b, sub)
        history.append({k: float(v) for k, v in metrics.items()})
    return model, params, pi, history


@pytest.mark.slow
def test_trf_nce_learns_toy_language():
    """Frozen-noise NCE: the TRF learns to discriminate data from the
    (untrained) noise LM, and its score ranks in-distribution text
    above out-of-distribution text."""
    model, params, pi, hist = _train("nce", 150)
    assert hist[-1]["acc_data"] > 0.8, hist[-1]
    assert hist[-1]["acc_noise"] > 0.8, hist[-1]
    good = batch_of([[1, 1, 1]])
    bad = batch_of([[5, 2, 4]])
    s_good = trf_score(model, params, pi, good["tokens"],
                       good["targets"], good["lengths"])
    s_bad = trf_score(model, params, pi, bad["tokens"], bad["targets"],
                      bad["lengths"])
    assert float(s_good[0]) > float(s_bad[0])
    # REBM residual score also available for rescoring
    r = rebm_score(model, params, good["tokens"], good["targets"],
                   good["lengths"])
    assert np.isfinite(float(r[0]))


@pytest.mark.slow
def test_trf_dnce_trains_noise_model():
    """Dynamic NCE: the ML term drags the noise LM toward the data
    (its data-ppl falls), after which acc_noise ≈ chance is EXPECTED
    (p_n ≈ p_d); the TRF score must still rank data above OOD."""
    model, params, pi, hist = _train("dnce", 150)
    early = np.mean([h["ppl_noiseM_data"] for h in hist[:10]])
    late = np.mean([h["ppl_noiseM_data"] for h in hist[-10:]])
    assert late < 0.5 * early, (early, late)
    assert hist[-1]["acc_data"] > 0.6, hist[-1]
    good = batch_of([[1, 1, 1]])
    bad = batch_of([[5, 2, 4]])
    s_good = trf_score(model, params, pi, good["tokens"],
                       good["targets"], good["lengths"])
    s_bad = trf_score(model, params, pi, bad["tokens"], bad["targets"],
                      bad["lengths"])
    assert float(s_good[0]) > float(s_bad[0])


def test_ebm_is_loss_and_grads():
    """IS estimator (model.py:1226-1237): self-normalized weights,
    finite loss/grads, ESS in (0, 1]."""
    from cat_tpu.lm.trf import make_ebm_is_loss

    model = tiny_model()
    params = init(model)
    pi = hist_length(np.asarray([3, 4, 5]), MAXLEN)
    loss_fn = make_ebm_is_loss(model, pi, method="is", max_len=MAXLEN)
    b = batch_of([[1, 2, 3], [4, 5], [2, 2, 1], [3]])

    def scalar(params):
        loss, _ = loss_fn(params, b, jax.random.PRNGKey(0))
        return loss

    (loss, (metrics, _)), grads = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, b, jax.random.PRNGKey(0)),
        has_aux=True))(params)
    assert np.isfinite(float(loss))
    assert 0.0 < float(metrics["is_ess"]) <= 1.0
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_ebm_mis_chain():
    """MIS persistent chain (MIS_step_parallel, model.py:842-905):
    functional chain threads through steps; acceptance in [0, 1]."""
    from cat_tpu.lm.trf import make_ebm_is_loss

    model = tiny_model()
    params = init(model)
    pi = hist_length(np.asarray([3, 4, 5]), MAXLEN)
    loss_fn = make_ebm_is_loss(model, pi, method="mis", max_len=MAXLEN)
    b = batch_of([[1, 2, 3], [4, 5], [2, 2, 1], [3]])
    chain = None
    rates = []
    for i in range(3):
        (loss, (metrics, chain)) = jax.jit(loss_fn)(
            params, b, jax.random.PRNGKey(i), chain)
        assert np.isfinite(float(loss))
        rates.append(float(metrics["accept_rate"]))
    assert all(0.0 <= r <= 1.0 for r in rates)
    assert chain is not None and chain[0].shape[1] == MAXLEN


def test_mh_within_gibbs_sweep():
    from cat_tpu.lm.trf import mh_within_gibbs_sweep

    model = tiny_model()
    params = init(model)
    b = batch_of([[1, 2, 3, 4], [4, 5, 1], [2, 2, 1, 1]])
    toks, tars, acc = jax.jit(
        lambda r, t, g, l: mh_within_gibbs_sweep(
            model, params, r, t, g, l, num_positions=3))(
        jax.random.PRNGKey(0), b["tokens"], b["targets"], b["lengths"])
    assert toks.shape == b["tokens"].shape
    assert 0.0 <= float(acc) <= 1.0
    # BOS column untouched; padding untouched
    assert np.all(np.asarray(toks)[:, 0] == 0)
    lens = np.asarray(b["lengths"])
    t_np = np.asarray(toks)
    for i in range(t_np.shape[0]):
        np.testing.assert_array_equal(
            t_np[i, lens[i]:], np.asarray(b["tokens"])[i, lens[i]:])
