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
