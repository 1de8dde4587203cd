"""Per-dataset data preparation (VERDICT r4 missing #3; reference
cat/utils/data/data_prep.py:33-370 + egs/<dataset>/local/data.sh).

Each test fabricates a tiny corpus in the dataset's expected raw
layout, runs the egs/<dataset>/local/prepare.py driver, and pushes the
result through the shared cat_tpu.utils.data_prep CLI (fbank + CMVN +
speed perturb → packed memmap or npz shards); the aishell path
continues into a real pipeline training run from the prepped data."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver(dataset):
    path = os.path.join(REPO, "egs", dataset, "local", "prepare.py")
    spec = importlib.util.spec_from_file_location(
        f"prep_{dataset}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tone_wav(path, seconds=0.4, freq=440.0, sr=16000, channels=1,
              seed=0):
    from cat_tpu.utils.audio import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = 0.3 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(
        t.shape)
    if channels > 1:
        x = np.stack([x] * channels, axis=1)
    write_wav(str(path), x.astype(np.float32), sr)


def _char_tok(texts):
    from cat_tpu.utils.tokenizer import SimpleTokenizer

    return SimpleTokenizer.from_corpus(texts, level="char")


def test_data_prep_segments_and_speed_perturb(tmp_path):
    """Unit coverage of the shared CLI pieces: a segments file cuts
    the recording; speed-perturb factors emit sp-prefixed copies with
    scaled frame counts."""
    from cat_tpu.utils.data_prep import features_iter, read_manifest

    d = tmp_path / "manifest"
    d.mkdir()
    _tone_wav(d / "rec0.wav", seconds=1.0)
    (d / "wav.scp").write_text(f"rec0 {d / 'rec0.wav'}\n")
    (d / "segments").write_text(
        "u0 rec0 0.00 0.40\nu1 rec0 0.50 1.00\n")
    (d / "text").write_text("u0 ab\nu1 ba\n")
    entries = read_manifest(str(d))
    assert len(entries) == 2
    outs = list(features_iter(entries, num_mel_bins=24,
                              speed_perturb=(0.9, 1.1)))
    uids = [u for u, _, _ in outs]
    assert "u0" in uids and "sp0.9-u0" in uids and "sp1.1-u1" in uids
    assert len(outs) == 6
    by_uid = {u: f for u, f, _ in outs}
    # 0.9x slower playback -> longer signal -> more frames
    assert by_uid["sp0.9-u0"].shape[0] > by_uid["u0"].shape[0]
    assert by_uid["sp1.1-u0"].shape[0] < by_uid["u0"].shape[0]
    assert all(f.shape[1] == 24 for f in by_uid.values())


@pytest.mark.slow
def test_aishell_driver_then_train(tmp_path):
    """aishell layout → prepare.py → data_prep (packed, +sp) →
    pipeline trains from the pre-packed data (stages 2-3)."""
    src = tmp_path / "data_aishell"
    words = ["你好", "天气", "不错", "再见", "谢谢"]
    (src / "transcript").mkdir(parents=True)
    lines = []
    for sub, n in (("train", 5), ("dev", 2), ("test", 2)):
        for i in range(n):
            spk = f"S{i % 2:04d}"
            uid = f"BAC009{spk}W{i:04d}{sub[0].upper()}"
            wdir = src / "wav" / sub / spk
            wdir.mkdir(parents=True, exist_ok=True)
            _tone_wav(wdir / f"{uid}.wav", freq=300 + 40 * i, seed=i)
            lines.append(f"{uid} {' '.join(words[i % 3: i % 3 + 2])}")
    (src / "transcript" / "aishell_transcript_v0.8.txt").write_text(
        "\n".join(lines) + "\n")

    out = tmp_path / "data"
    _driver("aishell").prepare(str(src), str(out))
    for sub, n in (("train", 5), ("dev", 2), ("test", 2)):
        scp = (out / sub / "wav.scp").read_text().strip().splitlines()
        assert len(scp) == n
    # spaces removed for char-level CER
    assert " " not in (out / "train" / "text").read_text().split(
        None, 1)[1].splitlines()[0]

    expdir = tmp_path / "exp"
    expdir.mkdir()
    texts = [l.split(None, 1)[1] for l in
             (out / "train" / "text").read_text().strip().splitlines()]
    tok = _char_tok(texts)
    tok.save(str(expdir / "tokenizer.tknz"))

    from cat_tpu.utils.data_prep import main as prep_main

    prep_main([str(out / "train"), str(tmp_path / "pkl-train"),
               "--tokenizer", str(expdir / "tokenizer.tknz"),
               "--num-mel-bins", "40", "--speed-perturb", "0.9", "1.1"])
    from cat_tpu.utils.data import SpeechDataset

    ds = SpeechDataset(str(tmp_path / "pkl-train"))
    assert len(ds) == 15 and ds.feat_dim == 40  # 5 utts x 3 speeds

    hyper = {
        "data": {"train": str(tmp_path / "pkl-train"),
                 "dev": str(out / "dev")},
        "feature": {"num_mel_bins": 40},
        "tokenizer": {"type": "SimpleTokenizer",
                      "file": "tokenizer.tknz"},
        "train": {"bin": "cat_tpu.ctc.train",
                  "option": {"frame_budget": 400, "num_buckets": 2,
                             "max_epochs": 2, "seed": 0}},
        "inference": {"split": "dev", "decode": {"beam_width": 2}},
    }
    config = {"trainer": {"loss": "ctc"},
              "encoder": {"type": "LSTM",
                          "kwargs": {"hdim": 16, "num_layers": 1,
                                     "bidirectional": True,
                                     "dropout_rate": 0.0}},
              "scheduler": {"type": "SchedulerEarlyStop",
                            "kwargs": {"min_step": 4, "stop_lr": 1e-5,
                                       "n_tol": 1, "gamma": 0.3},
                            "optimizer": {"type": "Adam",
                                          "kwargs": {"lr": 1e-3}}}}
    (expdir / "hyper-p.json").write_text(json.dumps(hyper))
    (expdir / "config.json").write_text(json.dumps(config))
    from cat_tpu.pipeline import asr

    asr.main([str(expdir), "--stop_stage", "3"])
    assert os.path.exists(expdir / "check" / "checkpoint.list")


def test_wsj_driver(tmp_path):
    src = tmp_path / "wsj"
    sd = src / "test_eval92" / "spk1"
    sd.mkdir(parents=True)
    for i in range(3):
        _tone_wav(sd / f"40{i}c020{i}.wav", seed=i)
    (sd / "spk1.dot").write_text(
        "THE QUICK [<door_slam>] BROWN <COMMA> FOX (40\\0c0200)\n"
        "jumped ~over the *lazy dog (401c0201)\n"
        "A \"QUOTED\" PHRASE (402c0202)\n".replace("\\0", "0"))
    out = tmp_path / "data"
    _driver("wsj").prepare(str(src), str(out), ["test_eval92"])
    text = dict(l.split(None, 1) for l in
                (out / "test_eval92" / "text").read_text()
                .strip().splitlines())
    assert text["400c0200"] == "THE QUICK BROWN FOX"
    assert text["401c0201"] == "JUMPED OVER THE LAZY DOG"
    assert text["402c0202"] == "A QUOTED PHRASE"
    scp = (out / "test_eval92" / "wav.scp").read_text().strip()
    assert len(scp.splitlines()) == 3


def test_commonvoice_driver(tmp_path):
    src = tmp_path / "cv"
    (src / "clips").mkdir(parents=True)
    rows = ["client_id\tpath\tsentence"]
    for i in range(4):
        stem = f"common_voice_de_{i:08d}"
        _tone_wav(src / "clips" / f"{stem}.wav", seed=i)
        rows.append(f"c{i}\t{stem}.mp3\thallo welt {i}")
    # one clip without a converted wav -> skipped
    rows.append("c9\tmissing_clip.mp3\tfehlt")
    (src / "train.tsv").write_text("\n".join(rows) + "\n")
    out = tmp_path / "data"
    _driver("commonvoice").prepare(str(src), str(out), ["train"])
    scp = (out / "train" / "wav.scp").read_text().strip().splitlines()
    assert len(scp) == 4
    text = (out / "train" / "text").read_text()
    assert "hallo welt 0" in text and "fehlt" not in text


def test_aishell4_driver_multichannel(tmp_path):
    src = tmp_path / "aishell4"
    room = src / "train_L"
    (room / "wav").mkdir(parents=True)
    (room / "TextGrid").mkdir()
    _tone_wav(room / "wav" / "L_R001.wav", seconds=3.0, channels=2)
    (room / "TextGrid" / "L_R001.TextGrid").write_text("""
File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0 \nxmax = 3.0
item []:
    item [1]:
        class = "IntervalTier"
        name = "spk01"
        intervals [1]:
            xmin = 0.10
            xmax = 1.00
            text = "你好 世界"
        intervals [2]:
            xmin = 1.00
            xmax = 1.20
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "spk02"
        intervals [1]:
            xmin = 0.50
            xmax = 2.40
            text = "重叠话语"
        intervals [2]:
            xmin = 2.50
            xmax = 2.90
            text = "再见"
""")
    out = tmp_path / "data"
    _driver("aishell4").prepare(str(src), str(out), ["train"])
    seg = (out / "train" / "segments").read_text().strip().splitlines()
    # greedy non-overlap keeps [0.1,1.0] and [2.5,2.9], drops the
    # overlapping [0.5,2.4]
    assert len(seg) == 2
    text = (out / "train" / "text").read_text()
    assert "你好世界" in text and "重叠" not in text

    # raw multichannel packing through the shared CLI (--channels)
    expdir = tmp_path / "exp"
    expdir.mkdir()
    tok = _char_tok(["你好世界再见"])
    tok.save(str(expdir / "tok.tknz"))
    from cat_tpu.utils.data_prep import main as prep_main

    prep_main([str(out / "train"), str(tmp_path / "pkl"),
               "--tokenizer", str(expdir / "tok.tknz"),
               "--channels", "2"])
    from cat_tpu.utils.data import SpeechDataset

    ds = SpeechDataset(str(tmp_path / "pkl"))
    assert len(ds) == 2 and ds.feat_dim == 2  # (L, C) raw waves
    wave, lab = ds[0]
    assert wave.shape[0] == pytest.approx(0.9 * 16000, rel=0.01)


def test_wenetspeech_driver_to_shards(tmp_path):
    src = tmp_path / "ws"
    (src / "audio" / "train").mkdir(parents=True)
    _tone_wav(src / "audio" / "train" / "X001.wav", seconds=2.0)
    meta = {"audios": [{
        "aid": "X001", "path": "audio/train/X001.opus",
        "segments": [
            {"sid": "X001_S000", "begin_time": 0.0, "end_time": 0.9,
             "text": "大 家 好", "subsets": ["M", "L"]},
            {"sid": "X001_S001", "begin_time": 1.0, "end_time": 1.9,
             "text": "谢 谢", "subsets": ["L"]},
            {"sid": "X001_S002", "begin_time": 1.0, "end_time": 1.5,
             "text": "", "subsets": ["L"]},
        ]}]}
    (src / "WenetSpeech.json").write_text(json.dumps(meta))
    out = tmp_path / "data"
    _driver("wenetspeech").prepare(str(src / "WenetSpeech.json"),
                                   str(out), ["M", "L"])
    assert len((out / "M" / "segments").read_text().strip()
               .splitlines()) == 1
    assert len((out / "L" / "segments").read_text().strip()
               .splitlines()) == 2
    assert "大家好" in (out / "M" / "text").read_text()

    tok = _char_tok(["大家好谢谢"])
    tok.save(str(tmp_path / "tok.tknz"))
    from cat_tpu.utils.data_prep import main as prep_main

    prep_main([str(out / "L"), str(tmp_path / "shards"),
               "--tokenizer", str(tmp_path / "tok.tknz"),
               "--format", "shards", "--shard-size", "1",
               "--num-mel-bins", "24"])
    from cat_tpu.utils.data_sharded import ShardedSpeechDataset

    ds = ShardedSpeechDataset(str(tmp_path / "shards") + "/shard-*.npz",
                              shuffle_buffer=4)
    items = list(ds.epoch(0))
    assert len(items) == 2
    assert all(f.shape[1] == 24 for _, f, _ in items)
