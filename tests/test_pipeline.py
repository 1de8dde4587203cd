"""End-to-end pipeline tests: the yesno milestone (SURVEY.md §7 step 5).

Synthesizes the toy two-tone dataset, then drives all 4 stages of
cat_tpu.pipeline.asr in-process, like the reference's egs/TEMPLATE yesno
recipes (egs/TEMPLATE/README.md:5-66) which effectively reach ~0% WER:

  - CTC + on-device prefix-beam decode (+ n-best dump + rescore)
  - CTC + TLG WFST decode from config alone
  - CTC-CRF (dense den) with grad accumulation + WER-scheduled eval
  - RNN-T (LogAdd joiner -> fused simple loss) + beam decode

All variants must reach WER < 5% on the toy task.
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def yesno_data(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "egs", "template", "local"))
    import make_data

    from cat_tpu.utils.audio import write_wav

    rng = np.random.default_rng(0)
    data_dir = tmp_path_factory.mktemp("yesno_data")
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
            write_wav(str(path), make_data.make_utt(rng, words),
                      make_data.SR)
            scp.append(f"{uid} {path}")
            text.append(f"{uid} {' '.join(words)}")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "text").write_text("\n".join(text) + "\n")
    return data_dir


def base_hyper(data_dir, train_bin="cat_tpu.ctc.train", opts=None,
               decode=None):
    return {
        "data": {"train": str(data_dir / "train"),
                 "dev": str(data_dir / "dev")},
        "feature": {"num_mel_bins": 40},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"},
                      "file": "tokenizer.tknz"},
        "train": {"bin": train_bin,
                  "option": dict({"frame_budget": 500, "num_buckets": 2,
                                  "max_epochs": 100, "seed": 0},
                                 **(opts or {}))},
        "inference": {"split": "dev",
                      "decode": dict({"beam_width": 4}, **(decode or {}))},
    }


ENC = {"type": "LSTM", "kwargs": {"hdim": 32, "num_layers": 1,
                                  "bidirectional": True,
                                  "dropout_rate": 0.0}}
SCHED = {"type": "SchedulerEarlyStop",
         "kwargs": {"min_step": 400, "stop_lr": 3e-4, "n_tol": 2,
                    "gamma": 0.3},
         "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}}}


def run_pipeline(tmp_path, hyper, config):
    expdir = tmp_path / "exp"
    expdir.mkdir()
    (expdir / "hyper-p.json").write_text(json.dumps(hyper))
    (expdir / "config.json").write_text(json.dumps(config))
    from cat_tpu.pipeline import asr
    asr.main([str(expdir)])
    return expdir, json.load(open(expdir / "wer_dev.json"))


@pytest.mark.slow
def test_pipeline_yesno_ctc_beam(yesno_data, tmp_path):
    hyper = base_hyper(yesno_data,
                       decode={"mode": "beam", "nbest": 4,
                               "rescore": {"alpha": 0.2, "beta": 0.5,
                                           "lm": {"type": "ngram",
                                                  "order": 2}}})
    config = {"trainer": {"loss": "ctc"}, "encoder": ENC,
              "scheduler": SCHED}
    expdir, res = run_pipeline(tmp_path, hyper, config)
    assert res["wer"] < 5.0, res
    assert res["rtf"] > 0
    assert os.path.exists(expdir / "decode_dev.txt")
    assert os.path.exists(expdir / "nbest_dev.pkl")
    assert os.path.exists(expdir / "check" / "checkpoint.list")
    # the n-best pickle feeds lm/rescore tooling
    from cat_tpu.utils.nbest import read_nbest
    nb = read_nbest(str(expdir / "nbest_dev.pkl"))
    assert len(nb) == 10 and all(len(v) >= 1 for v in nb.values())


@pytest.mark.slow
def test_pipeline_yesno_ctc_wfst(yesno_data, tmp_path):
    hyper = base_hyper(yesno_data,
                       decode={"mode": "wfst",
                               "wfst": {"order": 2, "beam": 30.0}})
    config = {"trainer": {"loss": "ctc"}, "encoder": ENC,
              "scheduler": SCHED}
    expdir, res = run_pipeline(tmp_path, hyper, config)
    assert res["wer"] < 5.0, res
    assert res["mode"] == "wfst"
    assert os.path.exists(expdir / "tlg.npz")


@pytest.mark.slow
def test_pipeline_yesno_crf_accum_werched(yesno_data, tmp_path):
    """CTC-CRF e2e with fold-2 grad accumulation and WER-scheduled
    checkpointing (custom_evaluate equivalent)."""
    hyper = base_hyper(yesno_data, opts={"eval_wer": True})
    config = {"trainer": {"loss": "crf", "lamb": 0.01,
                          "grad_accum_fold": 2},
              "encoder": ENC, "scheduler": SCHED}
    expdir, res = run_pipeline(tmp_path, hyper, config)
    assert res["wer"] < 5.0, res
    # the scheduler metric logged is a WER, not a loss
    metrics = [json.loads(l) for l in
               open(expdir / "check" / "metrics.jsonl")]
    assert any("dev_metric" in m for m in metrics)


@pytest.mark.slow
def test_pipeline_yesno_rnnt_simple(yesno_data, tmp_path):
    hyper = base_hyper(yesno_data, train_bin="cat_tpu.rnnt.train",
                       opts={"max_epochs": 150})
    config = {
        "encoder": ENC,
        "predictor": {"type": "LSTMPredictor",
                      "kwargs": {"hdim": 16, "num_layers": 1}},
        "joiner": {"type": "LogAdd", "kwargs": {}},
        "scheduler": SCHED,
    }
    expdir, res = run_pipeline(tmp_path, hyper, config)
    assert res["wer"] < 5.0, res
