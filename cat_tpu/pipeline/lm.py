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
    is_trf = hyper["train"].get("bin", "").endswith("train_trf")
    if is_trf:
        # TRF/EBM energy LM with NCE/DNCE (cat.lm.trf.train role)
        from cat_tpu.lm import train_trf

        model = train_trf.build_model(config,
                                      num_classes=tok.vocab_size)
        sched, tx = build_scheduler(config["scheduler"])
        state = train_trf.init_state(model, tx)
        pi = train_trf.length_prior(
            tr, max_len=config["decoder"].get("kwargs", {})
            .get("max_len", 200))
        trf_opts = train_trf.loss_options(config)
        train_step = train_trf.make_train_step(model, tx, pi, trf_opts)
        eval_step = train_trf.make_eval_step(model, pi, trf_opts)
    else:
        model = lm_train.build_model(config, num_classes=tok.vocab_size)
        sched, tx = build_scheduler(config["scheduler"])
        state = lm_train.init_state(model, tx)
        train_step = lm_train.make_train_step(model, tx)
        eval_step = lm_train.make_eval_step(model)

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
        train_step=train_step,
        eval_step=eval_step,
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

    ckpt = CheckpointManager(os.path.join(expdir, "check"))
    st = load_checkpoint(ckpt.path(ckpt.best()))["state"]
    params = st.params if hasattr(st, "params") else st["params"]
    if hyper["train"].get("bin", "").endswith("train_trf"):
        # TRF is unnormalized — no ppl; report mean dev TRF score
        # (usable only relatively, e.g. for rescoring)
        import jax.numpy as jnp
        import numpy as np

        from cat_tpu.lm import train_trf
        from cat_tpu.lm.trf import trf_score
        from cat_tpu.utils.data import CorpusDataset

        model = train_trf.build_model(config, num_classes=tok.vocab_size)
        dv = CorpusDataset(os.path.join(expdir, "pkl", "dev"))
        pi = train_trf.length_prior(
            dv, max_len=config["decoder"].get("kwargs", {})
            .get("max_len", 200))
        U = int(max(dv.token_length(i) for i in range(len(dv)))) + 2
        scores = []
        for i in range(len(dv)):
            ids = list(dv[i])[: U - 1]
            tokens = np.zeros((1, U), np.int32)
            targets = np.zeros((1, U), np.int32)
            tokens[0, 1: len(ids) + 1] = ids
            targets[0, : len(ids)] = ids
            s = trf_score(model, params, pi, jnp.asarray(tokens),
                          jnp.asarray(targets),
                          jnp.asarray([len(ids) + 1], np.int32))
            scores.append(float(s[0]))
        mean_score = float(np.mean(scores))
        with open(os.path.join(expdir, "ppl.json"), "w") as f:
            json.dump({"trf_score_mean": mean_score}, f)
        print(f"dev mean TRF score: {mean_score:.3f} "
              "(unnormalized; for rescoring)")
        return mean_score
    model = lm_train.build_model(config, num_classes=tok.vocab_size)
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
    if config.get("perf"):
        from cat_tpu.utils.flags import set_flags
        set_flags(**config["perf"])
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
