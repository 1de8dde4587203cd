"""Perplexity evaluation CLI for neural and n-gram LMs.

Counterpart of /root/reference/cat/lm/ppl.py (NN & n-gram perplexity).
"""
from __future__ import annotations

import argparse
import json
import os


def ppl_ngram(arpa_path, text_path):
    from cat_tpu.fst.ngram import read_arpa

    lm = read_arpa(arpa_path)
    with open(text_path) as f:
        sents = [line.split() for line in f if line.strip()]
    return lm.perplexity(sents)


def ppl_neural(expdir, text_path):
    import importlib

    from cat_tpu.lm import train as lm_train
    from cat_tpu.pipeline.asr import load_json
    from cat_tpu.utils import tokenizer as tknz
    from cat_tpu.utils.checkpoint import CheckpointManager, load_checkpoint

    hyper = load_json(os.path.join(expdir, "hyper-p.json"))
    config = load_json(os.path.join(expdir, "config.json"))
    tok = tknz.load(os.path.join(
        expdir, hyper["tokenizer"].get("file", "tokenizer.tknz")))
    model = lm_train.build_model(config, num_classes=tok.vocab_size)
    ckpt = CheckpointManager(os.path.join(expdir, "check"))
    st = load_checkpoint(ckpt.path(ckpt.best()))["state"]
    params = st.params if hasattr(st, "params") else st["params"]
    with open(text_path) as f:
        seqs = [tok.encode(line.strip()) for line in f if line.strip()]
    return lm_train.perplexity(model, params, seqs)


def main(argv=None):
    p = argparse.ArgumentParser("cat_tpu.lm.ppl")
    p.add_argument("model", help="expdir (neural) or .arpa path (ngram)")
    p.add_argument("text")
    args = p.parse_args(argv)
    if args.model.endswith(".arpa") or args.model.endswith(".arpa.gz"):
        value = ppl_ngram(args.model, args.text)
    else:
        value = ppl_neural(args.model, args.text)
    print(json.dumps({"ppl": value}))


if __name__ == "__main__":
    main()
