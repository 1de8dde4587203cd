"""CTC decoding: batched greedy + prefix beam search with n-gram fusion.

Replaces the reference's ctcdecode C++ extension (batched prefix beam
search + KenLM fusion, used in /root/reference/cat/ctc/decode.py:163-210)
and the greedy path. The encoder forward runs jitted on device; the beam
search here is the host reference implementation (exact prefix-merging
semantics); a static-shape on-device variant lives in
cat_tpu/ctc/decode_jax.py.
"""
from __future__ import annotations

import math
import os
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _lae(a, b):
    if a <= NEG_INF / 2:
        return b
    if b <= NEG_INF / 2:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def greedy_decode(log_probs, lengths, blank=0):
    """(N, T, V) log-probs → list[list[int]] (collapse repeats, drop
    blank)."""
    path = np.asarray(jnp.argmax(log_probs, axis=-1))
    lengths = np.asarray(lengths)
    out = []
    for n in range(path.shape[0]):
        seq, prev = [], -1
        for s in path[n, : lengths[n]]:
            if s != prev and s != blank:
                seq.append(int(s))
            prev = int(s)
        out.append(seq)
    return out


def prefix_beam_search(log_probs, length, beam_width=16, blank=0,
                       lm=None, alpha=0.0, beta=0.0, lm_sym=None,
                       nbest=1):
    """Prefix beam search for ONE utterance.

    log_probs: (T, V) numpy log-softmax. Optional n-gram fusion:
    lm: cat_tpu.fst.ngram.NGramLM scoring token ids (or via lm_sym
    mapping id→symbol); score += alpha·log10 p_lm + beta per word
    (the KenLM fusion semantics of ctcdecode).

    Returns list of (score, prefix tuple) sorted best-first.
    """
    lp = np.asarray(log_probs)[:int(length)]
    T, V = lp.shape
    LN10 = math.log(10.0)

    def lm_score(prefix, tok):
        if lm is None:
            return beta  # insertion bonus applies with or without LM
        ctx = tuple(lm_sym(t) if lm_sym else t for t in prefix)
        w = lm_sym(tok) if lm_sym else tok
        return alpha * lm.logp(ctx, w) * LN10 + beta

    # beams: prefix -> (p_blank, p_nonblank, lm_total)
    beams = {(): (0.0, NEG_INF, 0.0)}
    for t in range(T):
        row = lp[t]
        # prune vocab: consider top candidates + blank
        cand = np.argsort(row)[::-1][: max(beam_width * 2, 8)]
        if blank not in cand:
            cand = np.append(cand, blank)
        new = defaultdict(lambda: [NEG_INF, NEG_INF, 0.0])

        for prefix, (pb, pnb, lms) in beams.items():
            p_tot = _lae(pb, pnb)
            for v in cand:
                p = float(row[v])
                if v == blank:
                    e = new[prefix]
                    e[0] = _lae(e[0], p_tot + p)
                    e[2] = lms
                    continue
                last = prefix[-1] if prefix else None
                if v == last:
                    # repeat: extends non-blank stays same prefix
                    e = new[prefix]
                    e[1] = _lae(e[1], pnb + p)
                    e[2] = lms
                    # with blank in between: new prefix
                    np_prefix = prefix + (int(v),)
                    s = lm_score(prefix, int(v))
                    e2 = new[np_prefix]
                    e2[1] = _lae(e2[1], pb + p)
                    e2[2] = lms + s
                else:
                    np_prefix = prefix + (int(v),)
                    s = lm_score(prefix, int(v))
                    e2 = new[np_prefix]
                    e2[1] = _lae(e2[1], p_tot + p)
                    e2[2] = lms + s
        # prune to beam_width by total score incl. LM
        scored = []
        for prefix, (pb, pnb, lms) in new.items():
            scored.append((_lae(pb, pnb) + lms, prefix, (pb, pnb, lms)))
        scored.sort(key=lambda x: -x[0])
        beams = {p: st for _, p, st in scored[:beam_width]}

    final = [(_lae(pb, pnb) + lms, prefix)
             for prefix, (pb, pnb, lms) in beams.items()]
    final.sort(key=lambda x: -x[0])
    return final[:nbest]


def batch_prefix_beam_search(log_probs, lengths, **kw):
    """Loop wrapper over the batch; returns list of nbest lists."""
    out = []
    for n in range(np.shape(log_probs)[0]):
        out.append(prefix_beam_search(np.asarray(log_probs)[n],
                                      int(np.asarray(lengths)[n]), **kw))
    return out


def main(argv=None):
    """Decode CLI (cat/ctc/decode.py:33-234 equivalent): batched
    on-device AM forward + host beam search, n-best pickle + RTF."""
    import argparse
    import importlib
    import pickle
    import time

    import jax
    import jax.numpy as jnp

    from cat_tpu.pipeline.asr import load_json
    from cat_tpu.utils import tokenizer as tknz
    from cat_tpu.utils.checkpoint import CheckpointManager, load_checkpoint
    from cat_tpu.utils.data import SpeechDataset

    p = argparse.ArgumentParser("cat_tpu.ctc.decode")
    p.add_argument("expdir")
    p.add_argument("--split", default="dev")
    p.add_argument("--mode", default="beam",
                   choices=["greedy", "beam", "wfst"])
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--nbest", type=int, default=1)
    p.add_argument("--lm", default=None, help="ARPA path for fusion")
    p.add_argument("--alpha", type=float, default=0.3)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--graph", default=None, help="TLG npz for wfst mode")
    p.add_argument("--words", default=None, help="word symtable (w id)")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    hyper = load_json(os.path.join(args.expdir, "hyper-p.json"))
    config = load_json(os.path.join(args.expdir, "config.json"))
    tok = tknz.load(os.path.join(
        args.expdir, hyper["tokenizer"].get("file", "tokenizer.tknz")))
    task = importlib.import_module(hyper["train"]["bin"])
    model = task.build_model(config, num_classes=tok.vocab_size)
    ckpt = CheckpointManager(os.path.join(args.expdir, "check"))
    st = load_checkpoint(ckpt.path(ckpt.best()))["state"]
    params = st.params if hasattr(st, "params") else st["params"]
    stats = st.batch_stats if hasattr(st, "batch_stats") else {}
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    ds = SpeechDataset(os.path.join(args.expdir, "pkl", args.split))
    apply = jax.jit(lambda x, l: model.apply(variables, x, l,
                                             deterministic=True))
    lm = None
    if args.lm:
        from cat_tpu.fst.ngram import read_arpa
        lm = read_arpa(args.lm, to_int=True)
    wfst = None
    if args.mode == "wfst":
        from cat_tpu.fst.decode import WfstDecoder
        from cat_tpu.fst.fst import Fst
        if not args.graph:
            raise SystemExit("--graph TLG.npz required for wfst mode")
        wfst = WfstDecoder(Fst.load(args.graph),
                           beam=17.0, max_active=7000)
        id2word = {}
        if args.words:
            with open(args.words) as fh:
                for line in fh:
                    w, i = line.split()
                    id2word[int(i)] = w

    t0 = time.time()
    audio_s = 0.0
    hyps, nbest_out = {}, {}
    for i in range(len(ds)):
        f, _ = ds[i]
        audio_s += f.shape[0] * 0.01
        logits, olen = apply(jnp.asarray(f[None]),
                             jnp.asarray([f.shape[0]], np.int32))
        lp = jax.nn.log_softmax(logits, axis=-1)
        uid = ds.uids[i]
        if args.mode == "greedy":
            hyp_ids = greedy_decode(lp, olen)[0]
            hyps[uid] = tok.decode(hyp_ids)
            nbest_out[uid] = {0: (0.0, hyps[uid])}
        elif args.mode == "wfst":
            res = wfst.decode(np.asarray(lp[0]), int(olen[0]),
                              nbest=args.nbest)
            words = [id2word.get(w, str(w)) for w in res[0][1]] \
                if id2word else [str(w) for w in res[0][1]]
            hyps[uid] = " ".join(words)
            nbest_out[uid] = {b: (s, " ".join(
                id2word.get(w, str(w)) for w in seq))
                for b, (s, seq) in enumerate(res)}
        else:
            res = prefix_beam_search(
                np.asarray(lp[0]), int(olen[0]),
                beam_width=args.beam_width, lm=lm, alpha=args.alpha,
                beta=args.beta, nbest=args.nbest)
            hyps[uid] = tok.decode(list(res[0][1]))
            nbest_out[uid] = {b: (s, tok.decode(list(pre)))
                              for b, (s, pre) in enumerate(res)}
    wall = time.time() - t0
    out = args.output or os.path.join(args.expdir,
                                      f"decode_{args.split}.txt")
    with open(out, "w") as fh:
        for uid in sorted(hyps):
            fh.write(f"{uid}\t{hyps[uid]}\n")
    with open(out + ".nbest.pkl", "wb") as fh:
        pickle.dump(nbest_out, fh)
    print(f"decoded {len(hyps)} utts in {wall:.1f}s "
          f"(RTF {wall / max(audio_s, 1e-6):.4f})")


if __name__ == "__main__":
    main()
