"""LM experiment pipeline: tokenizer → pack corpus → train → perplexity.

Counterpart of /root/reference/cat/utils/pipeline/lm.py (376 LoC).
Expdir layout mirrors the ASR pipeline: hyper-p.json (data/tokenizer/
train options) + config.json (decoder/scheduler).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from cat_tpu.pipeline.asr import load_json


def stage_tokenizer(expdir, hyper):
    """LM variant: data.train is a raw text file (one sentence/line)."""
    from cat_tpu.utils import tokenizer as tknz

    cfg = hyper["tokenizer"]
    tpath = os.path.join(expdir, cfg.get("file", "tokenizer.tknz"))
    if os.path.exists(tpath):
        return tknz.load(tpath)
    opts = dict(cfg.get("option-init", {}))
    if "corpus" not in opts and cfg["type"] != "RawTokenizer":
        opts["corpus"] = hyper["data"]["train"]
    tok = tknz.initialize({"type": cfg["type"], "option-init": opts})
    tok.save(tpath)
    return tok


def stage_pack(expdir, hyper, tok):
    from cat_tpu.utils.data import pack_corpus

    pkl_dir = os.path.join(expdir, "pkl")
    for split in ("train", "dev"):
        out = os.path.join(pkl_dir, split)
        if os.path.exists(os.path.join(out, "corpus.npz")):
            continue
        path = hyper["data"][split]
        with open(path) as f:
            seqs = [tok.encode(line.strip()) for line in f
                    if line.strip()]
        pack_corpus(out, seqs)
    return pkl_dir


def stage_train(expdir, hyper, config, tok):
    import jax
    import jax.numpy as jnp

    from cat_tpu.lm import train as lm_train
    from cat_tpu.utils.checkpoint import CheckpointManager
    from cat_tpu.utils.data import CorpusDataset
    from cat_tpu.utils.manager import Manager
    from cat_tpu.utils.scheduler import build_scheduler

    opts = hyper["train"].get("option", {})
    tr = CorpusDataset(os.path.join(expdir, "pkl", "train"))
    dv = CorpusDataset(os.path.join(expdir, "pkl", "dev"))
    model = lm_train.build_model(config, num_classes=tok.vocab_size)
    sched, tx = build_scheduler(config["scheduler"])
    state = lm_train.init_state(model, tx)

    loader_kw = dict(token_budget=opts.get("token_budget", 8000),
                     num_buckets=opts.get("num_buckets", 4),
                     max_len=opts.get("max_len", 512))
    train_loader = lm_train.LmLoader(tr, seed=opts.get("seed", 0),
                                     **loader_kw)
    eval_loader = lm_train.LmLoader(dv, shuffle=False, **loader_kw)

    class _Wrap:
        def __init__(self, loader):
            self.loader = loader

        def epoch(self, i):
            for d in self.loader.epoch(i):
                yield _DictBatch(d)

        def __iter__(self):
            return self.epoch(0)

    class _DictBatch:
        def __init__(self, d):
            self._d = d

        def asdict(self):
            return self._d

    mgr = Manager(
        train_step=lm_train.make_train_step(model, tx),
        eval_step=lm_train.make_eval_step(model),
        state=state, scheduler=sched,
        ckpt=CheckpointManager(os.path.join(expdir, "check")),
        train_loader=_Wrap(train_loader),
        eval_loader=_Wrap(eval_loader),
        max_epochs=opts.get("max_epochs", 100),
        check_freq=opts.get("check_freq", -1))
    if opts.get("resume"):
        mgr.resume(opts["resume"])
    mgr.run()
    return mgr


def stage_eval(expdir, hyper, config, tok):
    from cat_tpu.lm import train as lm_train
    from cat_tpu.utils.checkpoint import CheckpointManager, load_checkpoint

    model = lm_train.build_model(config, num_classes=tok.vocab_size)
    ckpt = CheckpointManager(os.path.join(expdir, "check"))
    st = load_checkpoint(ckpt.path(ckpt.best()))["state"]
    params = st.params if hasattr(st, "params") else st["params"]
    with open(hyper["data"]["dev"]) as f:
        seqs = [tok.encode(line.strip()) for line in f if line.strip()]
    ppl = lm_train.perplexity(model, params, seqs)
    with open(os.path.join(expdir, "ppl.json"), "w") as f:
        json.dump({"ppl": ppl}, f)
    print(f"dev ppl: {ppl:.2f}")
    return ppl


def main(argv=None):
    p = argparse.ArgumentParser("cat_tpu.pipeline.lm")
    p.add_argument("expdir")
    p.add_argument("--start_stage", type=int, default=1)
    p.add_argument("--stop_stage", type=int, default=4)
    args = p.parse_args(argv)
    hyper = load_json(os.path.join(args.expdir, "hyper-p.json"))
    config = load_json(os.path.join(args.expdir, "config.json"))
    tok = stage_tokenizer(args.expdir, hyper)
    print(f"[stage 1] tokenizer ready, vocab={tok.vocab_size}")
    if args.start_stage <= 2 <= args.stop_stage:
        stage_pack(args.expdir, hyper, tok)
        print("[stage 2] corpus packed")
    if args.start_stage <= 3 <= args.stop_stage:
        stage_train(args.expdir, hyper, config, tok)
        print("[stage 3] training done")
    if args.start_stage <= 4 <= args.stop_stage:
        stage_eval(args.expdir, hyper, config, tok)


if __name__ == "__main__":
    main()
