"""4-stage ASR experiment pipeline: tokenizer → pack → train → decode.

Counterpart of /root/reference/cat/utils/pipeline/asr.py:153-577 and
common_utils.py: per-experiment hyper-p.json + config.json, stage
selection, vocab-size injection, model averaging and WER scoring.

Experiment layout (same two-JSON shape as the reference, SURVEY.md §5):

  expdir/
    hyper-p.json   {"data": {"train"/"dev"/"test": <datadir>},
                    "tokenizer": {"type", "option-init", "file"},
                    "train": {"bin": "cat_tpu.ctc.train"|"cat_tpu.rnnt.train",
                              "option": {...manager options...}},
                    "inference": {"avgmodel": {"mode","num"}, "decode": {...}}}
    config.json    {"trainer": {"loss": "ctc"|"crf", ...}, "encoder": ...,
                    "joiner"/"predictor": ..., "specaug": ...,
                    "scheduler": {..., "optimizer": ...}}

  <datadir>/ contains wav.scp (uid path) + text (uid transcript), or
  feats packed already.

Stages (reference asr.py:153-186):
  1 tokenizer  2 pack  3 train  4 decode+WER
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

import numpy as np


def load_json(path):
    with open(path) as f:
        return json.load(f)


def read_scp(path):
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def stage_tokenizer(expdir, hyper):
    from cat_tpu.utils import tokenizer as tknz

    cfg = hyper["tokenizer"]
    tpath = os.path.join(expdir, cfg.get("file", "tokenizer.tknz"))
    if os.path.exists(tpath):
        return tknz.load(tpath)
    opts = dict(cfg.get("option-init", {}))
    # corpus default: training transcripts
    if "corpus" not in opts and cfg["type"] != "RawTokenizer":
        tr = hyper["data"]["train"]
        text = read_scp(os.path.join(tr, "text"))
        corpus_path = os.path.join(expdir, "tokenizer_corpus.txt")
        with open(corpus_path, "w") as f:
            f.write("\n".join(text.values()))
        opts["corpus"] = corpus_path
    tok = tknz.initialize({"type": cfg["type"], "option-init": opts})
    tok.save(tpath)
    return tok


def extract_features(datadir, feat_cfg=None):
    """wav.scp + text → iterable of (uid, fbank feats, transcript)."""
    import jax.numpy as jnp

    from cat_tpu.ops.fbank import cmvn, log_fbank
    from cat_tpu.utils.audio import read_wav

    feat_cfg = feat_cfg or {}
    num_bins = feat_cfg.get("num_mel_bins", 80)
    scp = read_scp(os.path.join(datadir, "wav.scp"))
    text = read_scp(os.path.join(datadir, "text"))
    for uid, wav_path in scp.items():
        wav, sr = read_wav(wav_path)
        feats = log_fbank(jnp.asarray(wav[None]), num_bins=num_bins,
                          sample_rate=sr,
                          frame_length=int(sr * 0.025),
                          frame_shift=int(sr * 0.010),
                          fft_size=512)
        feats = cmvn(feats)
        yield uid, np.asarray(feats[0]), text.get(uid, "")


def stage_pack(expdir, hyper, tok):
    from cat_tpu.utils.data import pack_speech_data

    pkl_dir = os.path.join(expdir, "pkl")
    feat_cfg = hyper.get("feature", {})
    for split in ("train", "dev"):
        out = os.path.join(pkl_dir, split)
        if os.path.exists(os.path.join(out, "meta.npz")):
            continue
        datadir = hyper["data"][split]
        if os.path.exists(os.path.join(datadir, "meta.npz")):
            # pre-packed
            os.makedirs(pkl_dir, exist_ok=True)
            if not os.path.exists(out):
                os.symlink(os.path.abspath(datadir), out)
            continue
        pack_speech_data(out, extract_features(datadir, feat_cfg), tok)
    return pkl_dir


def stage_train(expdir, hyper, config, tok):
    import jax

    from cat_tpu.utils.checkpoint import CheckpointManager
    from cat_tpu.utils.data import BucketedLoader, SpeechDataset
    from cat_tpu.utils.manager import Manager
    from cat_tpu.utils.scheduler import build_scheduler

    task = importlib.import_module(hyper["train"]["bin"])
    opts = hyper["train"].get("option", {})
    pkl_dir = os.path.join(expdir, "pkl")
    tr_ds = SpeechDataset(os.path.join(pkl_dir, "train"))
    dv_ds = SpeechDataset(os.path.join(pkl_dir, "dev"))

    model = task.build_model(config, num_classes=tok.vocab_size)
    sched, tx = build_scheduler(config["scheduler"])
    state = task.init_state(model, tx, tr_ds.feat_dim)

    trainer_cfg = config.get("trainer", {})
    loss_type = trainer_cfg.get("loss", "ctc")
    den = None
    if loss_type == "crf":
        den = build_den(expdir, hyper, tok, tr_ds)
    specaug_cfg = config.get("specaug")

    loader_kw = dict(frame_budget=opts.get("frame_budget", 20000),
                     num_buckets=opts.get("num_buckets", 4),
                     multiple_of=max(jax.device_count(), 1))
    train_loader = BucketedLoader(tr_ds, seed=opts.get("seed", 0),
                                  **loader_kw)
    eval_loader = BucketedLoader(dv_ds, shuffle=False, **loader_kw)

    if hyper["train"]["bin"].endswith("rnnt.train"):
        train_step = task.make_train_step(model, tx,
                                          specaug_cfg=specaug_cfg)
        eval_step = task.make_eval_step(model)
    else:
        train_step = task.make_train_step(
            model, tx, loss_type, den=den,
            lamb=trainer_cfg.get("lamb", 0.1), specaug_cfg=specaug_cfg)
        eval_step = task.make_eval_step(
            model, loss_type, den=den, lamb=trainer_cfg.get("lamb", 0.1))

    # SPMD: shard batches over the 'data' mesh axis when more than one
    # device is present; params replicate, optimizer state ZeRO-1.
    put_batch = None
    if jax.device_count() > 1:
        from cat_tpu.parallel import (make_mesh, replicated,
                                      shard_batch, zero1_shardings)

        mesh = make_mesh()
        state = state.replace(
            params=jax.device_put(
                state.params,
                jax.tree_util.tree_map(lambda _: replicated(mesh),
                                       state.params)),
            opt_state=jax.device_put(
                state.opt_state, zero1_shardings(state.opt_state, mesh)))
        put_batch = lambda b: shard_batch(mesh, b)

    mgr = Manager(train_step=train_step, eval_step=eval_step, state=state,
                  scheduler=sched,
                  ckpt=CheckpointManager(os.path.join(expdir, "check")),
                  train_loader=train_loader, eval_loader=eval_loader,
                  put_batch=put_batch,
                  max_epochs=opts.get("max_epochs", 100),
                  check_freq=opts.get("check_freq", -1))
    _write_exp_readme(expdir, hyper, config, state, tok)
    resume = opts.get("resume")
    if resume:
        mgr.resume(resume)
    mgr.run()
    try:
        from cat_tpu.utils.plot import plot_monitor
        plot_monitor(os.path.join(expdir, "check"),
                     os.path.join(expdir, "monitor.png"))
    except Exception:
        pass
    return mgr


def _write_exp_readme(expdir, hyper, config, state, tok):
    """Auto-generated per-experiment readme (param count, device
    inventory) — coreutils.py:102-166 equivalent."""
    import jax

    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(state.params))
    devices = {}
    for d in jax.devices():
        devices[d.device_kind] = devices.get(d.device_kind, 0) + 1
    lines = [
        f"# Experiment {os.path.basename(os.path.abspath(expdir))}",
        "",
        f"- parameters: {n_params / 1e6:.2f} M",
        f"- vocabulary: {tok.vocab_size}",
        f"- loss: {config.get('trainer', {}).get('loss', 'ctc')}",
        f"- encoder: {config.get('encoder', {}).get('type')}",
        "- devices: " + ", ".join(f"{k} x{v}"
                                  for k, v in devices.items()),
        "",
        "## Settings",
        "```json",
        json.dumps(config, indent=1),
        "```",
    ]
    with open(os.path.join(expdir, "readme.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def build_den(expdir, hyper, tok, tr_ds):
    """Denominator LM from training transcripts (prep_den_lm.sh
    equivalent). Uses the dense MXU expansion (ops.crf_dense) when the
    unit vocabulary and LM order permit; arc tables otherwise."""
    from cat_tpu.fst.graph import DenGraph, build_den_fst
    from cat_tpu.fst.ngram import train_ngram
    from cat_tpu.ops.crf import DenDevice
    from cat_tpu.ops.crf_dense import DenseDen

    order = hyper.get("den_lm", {}).get("order", 3)
    use_dense = order <= 3 and tok.vocab_size <= 128
    dense_path = os.path.join(expdir, "den_dense.npz")
    graph_path = os.path.join(expdir, "den_graph.npz")
    if use_dense and os.path.exists(dense_path):
        return DenseDen.load(dense_path)
    if not use_dense and os.path.exists(graph_path):
        return DenDevice.from_graph(DenGraph.load(graph_path))
    seqs = []
    for i in range(len(tr_ds)):
        _, lab = tr_ds[i]
        seqs.append([int(x) for x in lab])
    lm = train_ngram(seqs, order=order)
    if use_dense:
        den = DenseDen.from_ngram(lm, num_classes=tok.vocab_size)
        den.save(dense_path)
        return den
    g = DenGraph.from_fst(build_den_fst(lm, num_classes=tok.vocab_size))
    g.save(graph_path)
    return DenDevice.from_graph(g)


def stage_decode(expdir, hyper, config, tok):
    import jax
    import jax.numpy as jnp

    from cat_tpu.ctc.decode import batch_prefix_beam_search
    from cat_tpu.utils.checkpoint import (CheckpointManager,
                                          average_checkpoints,
                                          load_checkpoint)
    from cat_tpu.utils.data import SpeechDataset
    from cat_tpu.utils.wer import wer

    task = importlib.import_module(hyper["train"]["bin"])
    pkl_dir = os.path.join(expdir, "pkl")
    test_split = hyper.get("inference", {}).get("split", "dev")
    ds = SpeechDataset(os.path.join(pkl_dir, test_split))
    model = task.build_model(config, num_classes=tok.vocab_size)

    ckpt = CheckpointManager(os.path.join(expdir, "check"))
    inf = hyper.get("inference", {})
    avg = inf.get("avgmodel", {})

    def unpack(st):
        if hasattr(st, "params"):
            return st.params, st.batch_stats
        return st["params"], st.get("batch_stats", {})

    best = ckpt.best()
    params, batch_stats = unpack(load_checkpoint(ckpt.path(best))["state"])
    if avg.get("num", 0) > 1:
        entries = sorted(ckpt.entries, key=lambda e: e[1])[: avg["num"]]
        paths = [ckpt.path(e[0]) for e in entries
                 if os.path.exists(ckpt.path(e[0]))]
        if len(paths) > 1:
            avg_state = average_checkpoints(paths, key="state")
            params, batch_stats = unpack(avg_state)

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    dec_cfg = inf.get("decode", {})
    beam = dec_cfg.get("beam_width", 16)
    is_rnnt = hyper["train"]["bin"].endswith("rnnt.train")
    hyps, refs = {}, {}
    if is_rnnt:
        from cat_tpu.rnnt.decode import RNNTBeamDecoder
        decoder = RNNTBeamDecoder(model, params, beam_width=beam)
    else:
        apply = jax.jit(lambda x, l: model.apply(
            variables, x, l, deterministic=True))
    for i in range(len(ds)):
        f, lab = ds[i]
        uid = ds.uids[i]
        if is_rnnt:
            res = decoder.decode(f[None], np.asarray([f.shape[0]],
                                                     np.int32))
            hyps[uid] = tok.decode(res[0][0][1])
        else:
            logits, olen = apply(jnp.asarray(f[None]),
                                 jnp.asarray([f.shape[0]], np.int32))
            lp = jax.nn.log_softmax(logits, axis=-1)
            nbest = batch_prefix_beam_search(np.asarray(lp),
                                             np.asarray(olen),
                                             beam_width=beam)[0]
            hyps[uid] = tok.decode(list(nbest[0][1]))
        refs[uid] = tok.decode([int(x) for x in lab])
    res = wer(refs, hyps, char_level=dec_cfg.get("cer", False))
    out_path = os.path.join(expdir, f"decode_{test_split}.txt")
    with open(out_path, "w") as f:
        for uid in sorted(hyps):
            f.write(f"{uid}\t{hyps[uid]}\n")
    with open(os.path.join(expdir, f"wer_{test_split}.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(f"WER {res['wer']:.2f}% "
          f"(sub {res['sub']} ins {res['ins']} del {res['del']})")
    return res


def main(argv=None):
    p = argparse.ArgumentParser("cat_tpu.pipeline.asr")
    p.add_argument("expdir")
    p.add_argument("--start_stage", type=int, default=1)
    p.add_argument("--stop_stage", type=int, default=4)
    args = p.parse_args(argv)
    hyper = load_json(os.path.join(args.expdir, "hyper-p.json"))
    config = load_json(os.path.join(args.expdir, "config.json"))

    tok = stage_tokenizer(args.expdir, hyper)
    print(f"[stage 1] tokenizer ready, vocab={tok.vocab_size}")
    if args.stop_stage < 2:
        return
    if args.start_stage <= 2:
        stage_pack(args.expdir, hyper, tok)
        print("[stage 2] data packed")
    if args.start_stage <= 3 <= args.stop_stage:
        stage_train(args.expdir, hyper, config, tok)
        print("[stage 3] training done")
    if args.start_stage <= 4 <= args.stop_stage:
        stage_decode(args.expdir, hyper, config, tok)
        print("[stage 4] decode done")


if __name__ == "__main__":
    main()
