"""End-to-end LM pipelines (neural + n-gram) on a synthetic corpus."""
import json
import os

import numpy as np
import pytest


def write_corpus(tmp_path):
    rng = np.random.default_rng(0)
    words = ["the", "cat", "dog", "sat", "ran", "on", "mat"]
    # simple bigram-ish patterns
    def sent():
        n = int(rng.integers(3, 7))
        s = ["the"]
        for _ in range(n):
            s.append(words[int(rng.integers(1, len(words)))])
        return " ".join(s)

    train = tmp_path / "train.txt"
    dev = tmp_path / "dev.txt"
    train.write_text("\n".join(sent() for _ in range(120)) + "\n")
    dev.write_text("\n".join(sent() for _ in range(20)) + "\n")
    return str(train), str(dev)


def test_ngram_pipeline(tmp_path):
    from cat_tpu.pipeline import ngram

    train, dev = write_corpus(tmp_path)
    expdir = tmp_path / "exp"
    expdir.mkdir()
    (expdir / "hyper-p.json").write_text(json.dumps({
        "data": {"train": train, "dev": dev},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"}},
        "ngram": {"order": 2},
    }))
    ngram.main([str(expdir)])
    res = json.load(open(expdir / "ngram.json"))
    assert os.path.exists(res["arpa"])
    assert res["dev_ppl"] < 20.0  # small vocab, patterned data


@pytest.mark.slow
def test_neural_lm_pipeline(tmp_path):
    from cat_tpu.pipeline import lm as lm_pipe

    train, dev = write_corpus(tmp_path)
    expdir = tmp_path / "exp"
    expdir.mkdir()
    (expdir / "hyper-p.json").write_text(json.dumps({
        "data": {"train": train, "dev": dev},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"}},
        "train": {"bin": "cat_tpu.lm.train",
                  "option": {"token_budget": 600, "num_buckets": 2,
                             "max_epochs": 8}},
    }))
    (expdir / "config.json").write_text(json.dumps({
        "decoder": {"type": "LSTMPredictor",
                    "kwargs": {"hdim": 24, "num_layers": 1}},
        "scheduler": {
            "type": "SchedulerFixedStop", "kwargs": {"stop_step": 10000},
            "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}}},
    }))
    lm_pipe.main([str(expdir)])
    ppl = json.load(open(expdir / "ppl.json"))["ppl"]
    assert ppl < 9.0  # vocab 9: must beat uniform clearly


@pytest.mark.slow
def test_trf_lm_pipeline(tmp_path):
    """TRF (dynamic NCE) through the LM pipeline: trains, stage 4
    reports the mean dev TRF score, and the trained model ranks
    in-distribution text above scrambled text (the verified drive
    recipe from round 2)."""
    import jax.numpy as jnp

    from cat_tpu.lm import train_trf
    from cat_tpu.lm.trf import trf_score
    from cat_tpu.pipeline import lm as lm_pipe
    from cat_tpu.utils import tokenizer as tknz
    from cat_tpu.utils.checkpoint import CheckpointManager, load_checkpoint
    from cat_tpu.utils.data import CorpusDataset

    train, dev = write_corpus(tmp_path)
    expdir = tmp_path / "exp"
    expdir.mkdir()
    config = {
        "decoder": {"type": "TRFNCE", "kwargs": {
            "energy_func": "sumtargetlogit", "method": "dnce",
            "noise_rate": 1.0, "alpha": 0.5, "noise_max_len": 12,
            "max_len": 16,
            "ebm": {"type": "LSTMPredictor", "kwargs": {"hdim": 24}},
            "noise": {"type": "LSTMPredictor", "kwargs": {"hdim": 24}}}},
        "scheduler": {"type": "SchedulerEarlyStop",
                      "kwargs": {"min_step": 50, "stop_lr": 1e-4,
                                 "n_tol": 3, "gamma": 0.5},
                      "optimizer": {"type": "Adam",
                                    "kwargs": {"lr": 3e-3}}},
    }
    (expdir / "hyper-p.json").write_text(json.dumps({
        "data": {"train": train, "dev": dev},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"},
                      "file": "tokenizer.tknz"},
        "train": {"bin": "cat_tpu.lm.train_trf",
                  "option": {"token_budget": 256, "num_buckets": 1,
                             "max_len": 12, "max_epochs": 12,
                             "seed": 0}},
    }))
    (expdir / "config.json").write_text(json.dumps(config))
    lm_pipe.main([str(expdir)])
    res = json.load(open(expdir / "ppl.json"))
    assert np.isfinite(res["trf_score_mean"])

    tok = tknz.load(str(expdir / "tokenizer.tknz"))
    model = train_trf.build_model(config, num_classes=tok.vocab_size)
    ck = CheckpointManager(str(expdir / "check"))
    st = load_checkpoint(ck.path(ck.best()))["state"]
    params = st.params if hasattr(st, "params") else st["params"]
    tr_ds = CorpusDataset(str(expdir / "pkl" / "train"))
    pi = train_trf.length_prior(tr_ds, max_len=16)

    def score(text):
        ids = tok.encode(text)
        U = 12
        tokens = np.zeros((1, U), np.int32)
        targets = np.zeros((1, U), np.int32)
        tokens[0, 1: len(ids) + 1] = ids
        targets[0, : len(ids)] = ids
        return float(trf_score(
            model, params, pi, jnp.asarray(tokens),
            jnp.asarray(targets),
            jnp.asarray([len(ids) + 1], np.int32))[0])

    # every training sentence starts with "the"
    assert score("the cat sat on mat") > score("mat on sat cat the")
