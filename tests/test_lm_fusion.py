"""External-LM fusion at decode from config (VERDICT r2 item 6;
reference cat/rnnt/decode.py:285-301 --lm-config/--alpha and
cat/shared/decoder.py:705-795 LODR)."""
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_neural_lm_scorer_matches_forward():
    """NeuralLMScorer.logp = log10 softmax of the LM's next-token
    logits, memoized per context; composes with CombinedLM."""
    from cat_tpu.fst.ngram import train_ngram
    from cat_tpu.lm import train as lm_train
    from cat_tpu.lm.scorer import LN10, NeuralLMScorer
    from cat_tpu.rnnt.decode import CombinedLM
    from cat_tpu.utils.scheduler import build_scheduler

    cfg = {"decoder": {"type": "LSTMPredictor",
                       "kwargs": {"hdim": 12, "num_layers": 1}}}
    model = lm_train.build_model(cfg, num_classes=5)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 10},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3}}})
    state = lm_train.init_state(model, tx)
    sc = NeuralLMScorer(model, state.params)

    ctx = (2, 3)
    got = sc.logp(ctx, 1)
    # direct forward: <s> + ctx, distribution at the last position
    toks = jnp.asarray([[0, 2, 3, 0]], jnp.int32)
    out = jax.jit(lambda t, l: model.apply(
        {"params": state.params}, t, l, deterministic=True))(
            toks, jnp.asarray([3], jnp.int32))
    logits = out[0] if isinstance(out, tuple) else out
    want = float(jax.nn.log_softmax(
        logits[0, 2].astype(jnp.float32))[1]) / LN10
    assert abs(got - want) < 1e-5
    # memoized second call, full distribution normalizes
    assert sc.logp(ctx, 1) == got
    dist = sc._dist(ctx)
    assert abs(np.exp(dist * LN10).sum() - 1.0) < 1e-4

    ng = train_ngram([[1, 2], [2, 1]] * 3, order=2)
    comb = CombinedLM([(sc, 1.0), (ng, -0.4)])
    assert np.isfinite(comb.logp(ctx, 1))


@pytest.mark.slow
def test_fusion_improves_undertrained_ctc(tmp_path):
    """Pipeline-level: decode an UNDERTRAINED yesno CTC model with and
    without a matched token n-gram LM (decode: {"lm": ...} → host
    prefix beam fusion). The LM must change the result and not hurt."""
    sys.path.insert(0, os.path.join(REPO, "egs", "template", "local"))
    import make_data

    from cat_tpu.pipeline import asr
    from cat_tpu.utils import tokenizer as tknz
    from cat_tpu.utils.audio import write_wav

    rng = np.random.default_rng(3)
    data = tmp_path / "data"
    for split, n in (("train", 48), ("dev", 20)):
        d = data / split
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

    hyper = {
        "data": {"train": str(data / "train"), "dev": str(data / "dev")},
        "feature": {"num_mel_bins": 40},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option-init": {"level": "word"},
                      "file": "tokenizer.tknz"},
        # deliberately undertrained: a noisy AM gives fusion room to act
        "train": {"bin": "cat_tpu.ctc.train",
                  "option": {"frame_budget": 500, "num_buckets": 2,
                             "max_epochs": 8, "seed": 0}},
        "inference": {"split": "dev", "decode": {"beam_width": 4}},
    }
    config = {"trainer": {"loss": "ctc"},
              "encoder": {"type": "LSTM",
                          "kwargs": {"hdim": 32, "num_layers": 1,
                                     "bidirectional": True,
                                     "dropout_rate": 0.0}},
              "scheduler": {"type": "SchedulerEarlyStop",
                            "kwargs": {"min_step": 5000,
                                       "stop_lr": 1e-4},
                            "optimizer": {"type": "Adam",
                                          "kwargs": {"lr": 5e-3}}}}
    expdir = tmp_path / "exp"
    expdir.mkdir()
    (expdir / "hyper-p.json").write_text(json.dumps(hyper))
    (expdir / "config.json").write_text(json.dumps(config))
    asr.main([str(expdir)])  # stages 1-4, no-LM decode
    res_base = json.load(open(expdir / "wer_dev.json"))

    tok = tknz.load(str(expdir / "tokenizer.tknz"))
    config2 = json.loads((expdir / "config.json").read_text())
    hyper_lm = json.loads(json.dumps(hyper))
    hyper_lm["inference"]["decode"].update(
        lm={"type": "ngram", "order": 2}, alpha=0.8, beta=0.5)
    res_lm = asr.stage_decode(str(expdir), hyper_lm, config2, tok)

    assert res_lm["wer"] <= res_base["wer"], (res_lm, res_base)
    # on an undertrained AM a matched LM must actually change hypotheses
    base_hyps = dict(l.split("\t") for l in
                     open(expdir / "decode_dev.txt")
                     if "\t" in l and l.strip())
    assert res_lm["wer"] < res_base["wer"] or res_base["wer"] == 0.0, \
        (res_lm, res_base)
