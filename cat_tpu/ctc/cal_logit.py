"""Dump AM logits for offline (TLG/WFST) decoding.

Counterpart of /root/reference/cat/ctc/cal_logit.py:27-120 (logits → .ark
for latgen-faster): here logits go to an .npz archive consumed by
cat_tpu.fst.decode.WfstDecoder.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def dump_logits(expdir, split="dev", out_path=None, config=None,
                hyper=None):
    import jax
    import jax.numpy as jnp

    from cat_tpu.pipeline.asr import load_json
    from cat_tpu.utils import tokenizer as tknz
    from cat_tpu.utils.checkpoint import CheckpointManager, load_checkpoint
    from cat_tpu.utils.data import SpeechDataset
    import importlib

    hyper = hyper or load_json(os.path.join(expdir, "hyper-p.json"))
    config = config or load_json(os.path.join(expdir, "config.json"))
    tok = tknz.load(os.path.join(
        expdir, hyper["tokenizer"].get("file", "tokenizer.tknz")))
    task = importlib.import_module(hyper["train"]["bin"])
    model = task.build_model(config, num_classes=tok.vocab_size)
    ckpt = CheckpointManager(os.path.join(expdir, "check"))
    st = load_checkpoint(ckpt.path(ckpt.best()))["state"]
    params = st.params if hasattr(st, "params") else st["params"]
    stats = st.batch_stats if hasattr(st, "batch_stats") else {}
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    ds = SpeechDataset(os.path.join(expdir, "pkl", split))
    apply = jax.jit(lambda x, l: model.apply(variables, x, l,
                                             deterministic=True))
    out = {}
    lens = {}
    for i in range(len(ds)):
        f, _ = ds[i]
        logits, olen = apply(jnp.asarray(f[None]),
                             jnp.asarray([f.shape[0]], np.int32))
        out[ds.uids[i]] = np.asarray(
            jax.nn.log_softmax(logits[0], axis=-1))[: int(olen[0])]
    out_path = out_path or os.path.join(expdir, f"logits_{split}.npz")
    np.savez_compressed(out_path, **out)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser("cat_tpu.ctc.cal_logit")
    p.add_argument("expdir")
    p.add_argument("--split", default="dev")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    print(dump_logits(args.expdir, args.split, args.output))


if __name__ == "__main__":
    main()
