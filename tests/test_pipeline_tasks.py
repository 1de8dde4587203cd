"""E2E pipeline tests for the task-adapter bins (VERDICT r2 item 1):
ME2E multichannel, JSA-SPG, and LLM-P2G driven from hyper-p.json alone
through cat_tpu.pipeline.asr.main — the same uniform 4-stage contract
the reference reaches via its Manager variants
(cat/utils/pipeline/common_utils.py:483-486, manager_wo/manager_jsa).
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pipeline(tmp_path, hyper, config):
    expdir = tmp_path / "exp"
    expdir.mkdir()
    (expdir / "hyper-p.json").write_text(json.dumps(hyper))
    (expdir / "config.json").write_text(json.dumps(config))
    from cat_tpu.pipeline import asr
    asr.main([str(expdir)])
    return expdir, json.load(open(expdir / "wer_dev.json"))


# ---------------------------------------------------------------- ME2E

@pytest.fixture(scope="module")
def me2e_data(tmp_path_factory):
    """Two-channel yesno: channel 1 = channel 0 delayed + noisier (a
    toy far-field array), 8 kHz."""
    sys.path.insert(0, os.path.join(REPO, "egs", "template", "local"))
    import make_data

    from cat_tpu.utils.audio import write_wav

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("me2e_data")
    for split, n in (("train", 96), ("dev", 12)):
        d = root / split
        wav_d = d / "wav"
        wav_d.mkdir(parents=True)
        scp, text = [], []
        for i in range(n):
            words = list(rng.choice(["yes", "no"],
                                    size=int(rng.integers(1, 4))))
            mono = make_data.make_utt(rng, words)
            ch1 = np.roll(mono, 2) + rng.standard_normal(
                len(mono)).astype(np.float32) * 0.02
            wave = np.stack([mono, ch1], axis=1)  # (L, 2)
            uid = f"{split}_{i:03d}"
            path = wav_d / (uid + ".wav")
            write_wav(str(path), wave, make_data.SR)
            scp.append(f"{uid} {path}")
            text.append(f"{uid} {' '.join(words)}")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "text").write_text("\n".join(text) + "\n")
    return root


@pytest.mark.slow
def test_pipeline_me2e(me2e_data, tmp_path):
    hyper = {
        "data": {"train": str(me2e_data / "train"),
                 "dev": str(me2e_data / "dev")},
        "feature": {"raw_wave": True, "channels": 2, "sample_rate": 8000},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"},
                      "file": "tokenizer.tknz"},
        "train": {"bin": "cat_tpu.ctc.train_me2e",
                  "option": {"frame_budget": 96000, "num_buckets": 2,
                             "max_epochs": 120, "seed": 0}},
        "inference": {"split": "dev",
                      "decode": {"beam_width": 2, "frame_budget": 48000,
                                 "num_buckets": 2}},
    }
    config = {
        "frontend": {"kwargs": {"num_bins": 20, "sample_rate": 8000,
                                "frame_length": 200, "frame_shift": 80,
                                "fft_size": 256, "mask_hidden": 16}},
        "encoder": {"type": "LSTM",
                    "kwargs": {"hdim": 32, "num_layers": 1,
                               "bidirectional": True,
                               "dropout_rate": 0.0}},
        "scheduler": {"type": "SchedulerEarlyStop",
                      "kwargs": {"min_step": 1000, "stop_lr": 1e-4,
                                 "n_tol": 4, "gamma": 0.5},
                      "optimizer": {"type": "Adam",
                                    "kwargs": {"lr": 5e-3}}},
    }
    expdir, res = run_pipeline(tmp_path, hyper, config)
    assert res["wer"] < 10.0, res
    assert res["rtf"] > 0
    assert os.path.exists(expdir / "check" / "checkpoint.list")


# ------------------------------------------------------------- JSA-SPG

@pytest.fixture(scope="module")
def jsa_data(tmp_path_factory):
    """Mono yesno + lexicon (yes→J E S, no→N O) + full phoneme
    supervision (text_phone = text: the lexicon tokenizer maps word
    text to phones)."""
    sys.path.insert(0, os.path.join(REPO, "egs", "template", "local"))
    import make_data

    from cat_tpu.utils.audio import write_wav

    rng = np.random.default_rng(1)
    root = tmp_path_factory.mktemp("jsa_data")
    (root / "lexicon.txt").write_text("yes J E S\nno N O\n")
    for split, n in (("train", 48), ("dev", 16)):
        d = root / split
        wav_d = d / "wav"
        wav_d.mkdir(parents=True)
        scp, text = [], []
        for i in range(n):
            words = list(rng.choice(["yes", "no"],
                                    size=int(rng.integers(1, 4))))
            uid = f"{split}_{i:03d}"
            path = wav_d / (uid + ".wav")
            write_wav(str(path), make_data.make_utt(rng, words),
                      make_data.SR)
            scp.append(f"{uid} {path}")
            text.append(f"{uid} {' '.join(words)}")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "text").write_text("\n".join(text) + "\n")
        # supervised substitution: phoneme supervision for every utt
        (d / "text_phone").write_text("\n".join(text) + "\n")
    return root


@pytest.mark.slow
def test_pipeline_jsa(jsa_data, tmp_path):
    hyper = {
        "data": {"train": str(jsa_data / "train"),
                 "dev": str(jsa_data / "dev")},
        "feature": {"num_mel_bins": 40},
        "tokenizer": {"type": "LexiconTokenizer",
                      "option-init": {"lexicon": str(jsa_data /
                                                     "lexicon.txt")},
                      "file": "tokenizer_phone.tknz"},
        "tokenizer_grapheme": {"type": "SimpleTokenizer",
                               "option-init": {"level": "word"},
                               "file": "tokenizer_graph.tknz"},
        "train": {"bin": "cat_tpu.ctc.train_jsa",
                  "option": {"frame_budget": 800, "num_buckets": 2,
                             "max_epochs": 60, "num_samples": 2,
                             "sample_beam": 2, "seed": 0}},
        "inference": {"split": "dev",
                      "decode": {"beam_width": 4, "num_z": 2,
                                 "marginalize": True}},
    }
    config = {
        "s2p": {"type": "LSTM",
                "kwargs": {"hdim": 32, "num_layers": 1,
                           "bidirectional": True, "dropout_rate": 0.0}},
        "p2g": {"type": "EmbeddingEncoder",
                "kwargs": {"num_cells": 1, "hdim": 16, "num_heads": 2,
                           "kernel_size": 3, "dropout_rate": 0.0}},
        "g2p": {"type": "EmbeddingEncoder",
                "kwargs": {"num_cells": 1, "hdim": 16, "num_heads": 2,
                           "kernel_size": 3, "dropout_rate": 0.0}},
        "trainer": {"upsample": 2},
        "scheduler": {"type": "SchedulerEarlyStop",
                      "kwargs": {"min_step": 500, "stop_lr": 3e-4,
                                 "n_tol": 3, "gamma": 0.5},
                      "optimizer": {"type": "Adam",
                                    "kwargs": {"lr": 5e-3}}},
    }
    expdir, res = run_pipeline(tmp_path, hyper, config)
    assert res["mode"] == "marginalize"
    assert res["wer"] < 10.0, res
    # the MIS machinery must have produced per-model losses in the log
    metrics = [json.loads(l) for l in
               open(expdir / "check" / "metrics.jsonl")]
    assert any("dev_loss" in m for m in metrics)


# ------------------------------------------------------------- LLM-P2G

WORDS = {"alpha": "a l f a", "bravo": "b r a v o",
         "charlie": "c a r l i", "delta": "d e l t a",
         "echo": "e k o"}


@pytest.fixture(scope="module")
def p2g_data(tmp_path_factory):
    """Deterministic phoneme→word data + noisy 3-best candidates
    (the offline DANP/TKM product of an S2P model)."""
    rng = np.random.default_rng(2)
    root = tmp_path_factory.mktemp("p2g_data")
    phones = sorted({p for s in WORDS.values() for p in s.split()})
    # 400 train draws ≈ full coverage of the ≤3-word combination space
    # (155 combos): the tiny model must map, not memorize-and-guess
    for split, n in (("train", 400), ("dev", 30)):
        d = root / split
        d.mkdir(parents=True)
        src, text, nbest = [], [], []
        for i in range(n):
            words = list(rng.choice(sorted(WORDS),
                                    size=int(rng.integers(1, 4))))
            uid = f"{split}_{i:03d}"
            ph = " ".join(WORDS[w] for w in words)
            src.append(f"{uid} {ph}")
            text.append(f"{uid} {' '.join(words)}")
            # candidate 0: truth; 1-2: phoneme substitutions
            nbest.append(f"{uid} 0.0 {ph}")
            for k in range(2):
                toks = ph.split()
                j = int(rng.integers(0, len(toks)))
                toks[j] = phones[int(rng.integers(0, len(phones)))]
                nbest.append(f"{uid} -{k + 1}.0 {' '.join(toks)}")
        (d / "src").write_text("\n".join(src) + "\n")
        (d / "text").write_text("\n".join(text) + "\n")
        (d / "src_nbest").write_text("\n".join(nbest) + "\n")
    return root


def p2g_hyper(root, mode, decode=None, tkm=None):
    h = {
        "data": {"train": str(root / "train"), "dev": str(root / "dev")},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"},
                      "file": "tokenizer_phone.tknz"},
        "tokenizer_grapheme": {"type": "SimpleTokenizer",
                               "option-init": {"level": "word"},
                               "file": "tokenizer_graph.tknz"},
        "train": {"bin": "cat_tpu.p2g.train",
                  "option": {"mode": mode, "frame_budget": 512,
                             "num_buckets": 2, "max_epochs": 250,
                             "seed": 0}},
        "inference": {"split": "dev",
                      "decode": dict({"max_len": 8}, **(decode or {}))},
    }
    if tkm:
        h["tkm"] = tkm
    return h


P2G_CONFIG = {
    "p2g": {"kwargs": {"hdim": 32, "enc_layers": 1, "dec_layers": 1,
                       "num_heads": 2, "ff_dim": 64,
                       "dropout_rate": 0.0}},
    "scheduler": {"type": "SchedulerEarlyStop",
                  "kwargs": {"min_step": 700, "stop_lr": 1e-4,
                             "n_tol": 4, "gamma": 0.5},
                  "optimizer": {"type": "Adam",
                                "kwargs": {"lr": 3e-3}}},
}


@pytest.mark.slow
def test_pipeline_p2g_ce(p2g_data, tmp_path):
    hyper = p2g_hyper(p2g_data, "ce")
    expdir, res = run_pipeline(tmp_path, hyper, P2G_CONFIG)
    assert res["wer"] < 5.0, res
    assert res["mode"] == "greedy"


@pytest.mark.slow
def test_pipeline_p2g_tkm_marginalize(p2g_data, tmp_path):
    hyper = p2g_hyper(p2g_data, "tkm",
                      decode={"marginalize": True},
                      tkm={"k": 3, "temperature": 1.0})
    expdir, res = run_pipeline(tmp_path, hyper, P2G_CONFIG)
    assert res["wer"] < 5.0, res
    assert res["mode"] == "marginalize"
