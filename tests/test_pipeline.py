"""End-to-end pipeline test: the yesno-milestone (SURVEY.md §7 step 5).

Synthesizes the toy two-tone dataset, then drives all 4 stages of
cat_tpu.pipeline.asr (tokenizer → pack fbank features → CTC train →
prefix-beam decode + WER) in-process. Keep it minutes-scale: tiny BLSTM,
few utterances.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pipeline_yesno_ctc(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "egs", "template", "local"))
    import make_data

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "data"
    for split, n in (("train", 48), ("dev", 10)):
        d = data_dir / split
        wav_d = d / "wav"
        wav_d.mkdir(parents=True)
        scp, text = [], []
        for i in range(n):
            words = list(rng.choice(["yes", "no"],
                                    size=int(rng.integers(1, 4))))
            uid = f"{split}_{i:03d}"
            path = wav_d / (uid + ".wav")
            from cat_tpu.utils.audio import write_wav
            write_wav(str(path), make_data.make_utt(rng, words),
                      make_data.SR)
            scp.append(f"{uid} {path}")
            text.append(f"{uid} {' '.join(words)}")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "text").write_text("\n".join(text) + "\n")

    expdir = tmp_path / "exp"
    expdir.mkdir()
    hyper = {
        "data": {"train": str(data_dir / "train"),
                 "dev": str(data_dir / "dev")},
        "feature": {"num_mel_bins": 40},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"},
                      "file": "tokenizer.tknz"},
        "train": {"bin": "cat_tpu.ctc.train",
                  "option": {"frame_budget": 500, "num_buckets": 2,
                             "max_epochs": 100, "seed": 0}},
        "inference": {"split": "dev",
                      "decode": {"beam_width": 4}},
    }
    config = {
        "trainer": {"loss": "ctc"},
        "encoder": {"type": "LSTM",
                    "kwargs": {"hdim": 32, "num_layers": 1,
                               "bidirectional": True,
                               "dropout_rate": 0.0}},
        "scheduler": {
            "type": "SchedulerEarlyStop",
            "kwargs": {"min_step": 400, "stop_lr": 3e-4, "n_tol": 2,
                       "gamma": 0.3},
            "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}}},
    }
    (expdir / "hyper-p.json").write_text(json.dumps(hyper))
    (expdir / "config.json").write_text(json.dumps(config))

    from cat_tpu.pipeline import asr
    asr.main([str(expdir)])

    res = json.load(open(expdir / "wer_dev.json"))
    assert res["wer"] < 35.0, res  # toy task must be mostly solvable
    assert os.path.exists(expdir / "decode_dev.txt")
    assert os.path.exists(expdir / "check" / "checkpoint.list")
