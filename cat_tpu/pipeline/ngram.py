"""N-gram LM pipeline: tokenize → count → ARPA → perplexity.

Counterpart of /root/reference/cat/utils/pipeline/ngram.sh:43-100
(KenLM lmplz/build_binary) using the native Kneser-Ney trainer.
"""
from __future__ import annotations

import argparse
import json
import os

from cat_tpu.fst.ngram import train_ngram, write_arpa, read_arpa
from cat_tpu.pipeline.lm import stage_tokenizer
from cat_tpu.pipeline.asr import load_json


def main(argv=None):
    p = argparse.ArgumentParser("cat_tpu.pipeline.ngram")
    p.add_argument("expdir")
    p.add_argument("--order", type=int, default=None)
    args = p.parse_args(argv)
    hyper = load_json(os.path.join(args.expdir, "hyper-p.json"))
    order = args.order or hyper.get("ngram", {}).get("order", 3)
    tok = stage_tokenizer(args.expdir, hyper)

    def read_ids(path):
        with open(path) as f:
            return [tok.encode(line.strip()) for line in f
                    if line.strip()]

    train_seqs = read_ids(hyper["data"]["train"])
    lm = train_ngram(train_seqs, order=order)
    arpa_path = os.path.join(args.expdir, f"{order}gram.arpa")
    write_arpa(lm, arpa_path)
    result = {"arpa": arpa_path, "order": order}
    if "dev" in hyper.get("data", {}):
        dev_seqs = read_ids(hyper["data"]["dev"])
        result["dev_ppl"] = lm.perplexity(dev_seqs)
    with open(os.path.join(args.expdir, "ngram.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
