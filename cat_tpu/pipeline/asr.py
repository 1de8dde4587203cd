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


def build_tokenizer(expdir, hyper, key="tokenizer", corpus_file="text"):
    """Build/load one tokenizer named by a hyper-p key. corpus default:
    the `corpus_file` column values of the first training dir."""
    from cat_tpu.utils import tokenizer as tknz

    cfg = hyper[key]
    tpath = os.path.join(expdir, cfg.get("file", key + ".tknz"))
    if os.path.exists(tpath):
        return tknz.load(tpath)
    opts = dict(cfg.get("option-init", {}))
    if "corpus" not in opts and cfg["type"] != "RawTokenizer":
        tr = _train_sets(hyper)[0][0]
        text = read_scp(os.path.join(tr, corpus_file))
        corpus_path = os.path.join(expdir, f"{key}_corpus.txt")
        with open(corpus_path, "w") as f:
            f.write("\n".join(text.values()))
        opts["corpus"] = corpus_path
    tok = tknz.initialize({"type": cfg["type"], "option-init": opts})
    tok.save(tpath)
    return tok


def stage_tokenizer(expdir, hyper):
    return build_tokenizer(expdir, hyper)


def load_tokenizers(expdir, hyper):
    """All tokenizers the experiment declares: every hyper-p key that
    starts with 'tokenizer' (e.g. tokenizer + tokenizer_grapheme for
    JSA-SPG's dual phoneme/grapheme vocabularies, manager_jsa.py role).
    For P2G experiments the primary tokenizer's corpus is the phoneme
    `src` column, not the transcript."""
    from cat_tpu.pipeline import tasks

    task = tasks.get_task(hyper)
    out = {}
    for key in hyper:
        if key.startswith("tokenizer"):
            corpus_file = "text"
            if task is not None:
                corpus_file = task.tokenizer_corpus_file(key)
            out[key] = build_tokenizer(expdir, hyper, key, corpus_file)
    return out


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


def _is_rnnt(hyper):
    """Transducer bins: cat_tpu.rnnt.train / cat_tpu.rnnt.train_unified."""
    return hyper["train"]["bin"].startswith("cat_tpu.rnnt.")


def _train_sets(hyper):
    """hyper["data"]["train"] may be one dir, a list of dirs, or a list
    of {"path": dir, "weight": w} — multiple weighted train sets
    (manager_wo's WeightedConcatDataset multi-trset training)."""
    tr = hyper["data"]["train"]
    if isinstance(tr, (str, os.PathLike)):
        return [(str(tr), 1.0)]
    out = []
    for item in tr:
        if isinstance(item, dict):
            out.append((str(item["path"]),
                        float(item.get("weight", 1.0))))
        else:
            out.append((str(item), 1.0))
    return out


def stage_pack(expdir, hyper, tok):
    from cat_tpu.utils.data import pack_speech_data

    pkl_dir = os.path.join(expdir, "pkl")
    feat_cfg = hyper.get("feature", {})
    sets = [("dev", hyper["data"]["dev"])]
    # streaming-shards training (manager.py:100-202 wds role): the
    # train set is consumed directly from shards; only dev is packed
    if not hyper["train"].get("option", {}).get("sharded_data"):
        trs = _train_sets(hyper)
        if len(trs) == 1:
            sets.append(("train", trs[0][0]))
        else:
            sets.extend((f"train_{i}", p) for i, (p, _) in enumerate(trs))
    for split, datadir in sets:
        out = os.path.join(pkl_dir, split)
        if os.path.exists(os.path.join(out, "meta.npz")):
            continue
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
    sharded = opts.get("sharded_data")
    dv_ds = SpeechDataset(os.path.join(pkl_dir, "dev"))
    if sharded:
        tr_ds = None  # streamed from shards; feat_dim/den come from dev
    else:
        trs = _train_sets(hyper)
        if len(trs) == 1:
            tr_ds = SpeechDataset(os.path.join(pkl_dir, "train"))
        else:
            from cat_tpu.utils.data import WeightedConcatDataset

            tr_ds = WeightedConcatDataset(
                [SpeechDataset(os.path.join(pkl_dir, f"train_{i}"))
                 for i in range(len(trs))],
                weights=[w for _, w in trs])

    model = task.build_model(config, num_classes=tok.vocab_size)
    sched, tx = build_scheduler(config["scheduler"])

    trainer_cfg = config.get("trainer", {})
    loss_type = trainer_cfg.get("loss", "ctc")
    # fold-N gradient accumulation (manager.py:660-676 semantics): the
    # wrapped transform carries the accumulators inside opt_state
    fold = int(trainer_cfg.get("grad_accum_fold",
                               opts.get("grad_accum_fold", 1)))
    grad_clip = float(trainer_cfg.get("grad_clip", 5.0))
    if fold > 1:
        from cat_tpu.ctc.train import accum_tx
        tx = accum_tx(tx, fold, grad_clip)
    feat_dim = dv_ds.feat_dim if sharded else tr_ds.feat_dim
    state = task.init_state(model, tx, feat_dim)

    den = None
    if loss_type == "crf":
        # sharded mode: den LM from hyper["den_lm"]["path"], a cached
        # expdir den_{dense,graph}.npz, or a label-only pre-pass over
        # the shard files (reference: wenetspeech CRF through wds,
        # cat/shared/manager.py:100-202)
        pattern = None
        if sharded:
            pattern = str(sharded)
            if os.path.isdir(pattern):
                pattern = os.path.join(pattern, "shard-*.npz")
        den = build_den(expdir, hyper, tok, tr_ds,
                        shard_pattern=pattern)
    specaug_cfg = config.get("specaug")

    loader_kw = dict(frame_budget=opts.get("frame_budget", 20000),
                     num_buckets=opts.get("num_buckets", 4),
                     multiple_of=max(jax.device_count(), 1),
                     host_index=jax.process_index(),
                     host_count=jax.process_count())
    if sharded:
        # streaming-shards train path (hyper option "sharded_data":
        # shard dir or glob/brace pattern; reference
        # cat/shared/manager.py:100-202 + prep_wds.py). Host split =
        # shards[host::count]; shuffle-buffer + shard shuffle seeded;
        # mid-epoch resume is wds-style NON-strict (Manager skips N
        # batches of the re-streamed epoch, which re-shuffles).
        from cat_tpu.utils.data_sharded import (ShardedSpeechDataset,
                                                StreamingBucketLoader)

        pattern = str(sharded)
        if os.path.isdir(pattern):
            pattern = os.path.join(pattern, "shard-*.npz")
        shard_ds = ShardedSpeechDataset(
            pattern, host_index=jax.process_index(),
            host_count=jax.process_count(),
            shuffle_buffer=opts.get("shuffle_buffer", 1024),
            seed=opts.get("seed", 0))
        buckets = opts.get("buckets", (400, 800, 1200, 1700))
        train_loader = StreamingBucketLoader(
            shard_ds, frame_budget=opts.get("frame_budget", 20000),
            buckets=tuple(buckets),
            label_caps=opts.get("label_caps"),
            multiple_of=max(jax.device_count(), 1) // jax.process_count()
            if jax.process_count() > 1 else max(jax.device_count(), 1),
            feat_dim=feat_dim)
    else:
        train_loader = BucketedLoader(tr_ds, seed=opts.get("seed", 0),
                                      **loader_kw)
    eval_loader = BucketedLoader(dv_ds, shuffle=False, **loader_kw)

    if _is_rnnt(hyper):
        rnnt_kw = dict(topo=trainer_cfg.get("topo", "rnnt"),
                       eos_id=trainer_cfg.get("eos_id", -1),
                       joiner_normalized=config.get("joiner", {}).get(
                           "type") == "HAT")
        if hyper["train"]["bin"].endswith("train_unified"):
            # CUSIDE transducer (cat/rnnt/train_unified.py role)
            rnnt_kw.update(
                lamb_chunk=trainer_cfg.get("lamb_chunk", 0.5),
                future=trainer_cfg.get("future", "simu"))
            train_step = task.make_train_step(
                model, tx, specaug_cfg=specaug_cfg, grad_clip=grad_clip,
                grad_accum_fold=fold,
                lamb_simu=trainer_cfg.get("lamb_simu", 1.0), **rnnt_kw)
        else:
            train_step = task.make_train_step(
                model, tx, specaug_cfg=specaug_cfg, grad_clip=grad_clip,
                grad_accum_fold=fold, **rnnt_kw)
        eval_step = task.make_eval_step(model, **rnnt_kw)
    else:
        train_step = task.make_train_step(
            model, tx, loss_type, den=den,
            lamb=trainer_cfg.get("lamb", 0.1), specaug_cfg=specaug_cfg,
            grad_clip=grad_clip, grad_accum_fold=fold)
        eval_step = task.make_eval_step(
            model, loss_type, den=den, lamb=trainer_cfg.get("lamb", 0.1))

    # SPMD: shard batches over the 'data' mesh axis when more than one
    # device is present; params replicate (or Megatron-TP-shard over
    # 'model' when config "parallel": {"model": M} asks), optimizer
    # state ZeRO-1 over 'data'.
    put_batch = None
    if jax.device_count() > 1:
        from cat_tpu.parallel import (make_mesh, replicated,
                                      shard_batch,
                                      tensor_parallel_shardings,
                                      zero1_shardings)

        mp = int(config.get("parallel", {}).get("model", 1))
        mesh = make_mesh(num_model=mp)
        if mp > 1:
            p_sh = tensor_parallel_shardings(state.params, mesh)
        else:
            p_sh = jax.tree_util.tree_map(lambda _: replicated(mesh),
                                          state.params)
        state = state.replace(
            params=jax.device_put(state.params, p_sh),
            opt_state=jax.device_put(
                state.opt_state, zero1_shardings(state.opt_state, mesh)))
        put_batch = lambda b: shard_batch(mesh, b)

    mgr = Manager(train_step=train_step, eval_step=eval_step, state=state,
                  scheduler=sched,
                  ckpt=CheckpointManager(os.path.join(expdir, "check")),
                  train_loader=train_loader, eval_loader=eval_loader,
                  put_batch=put_batch,
                  max_epochs=opts.get("max_epochs", 100),
                  check_freq=opts.get("check_freq", -1),
                  grad_accum_fold=fold,
                  eval_metric=_make_eval_metric(
                      hyper, config, model, tok, dv_ds, opts))
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


def _make_eval_metric(hyper, config, model, tok, dv_ds, opts):
    """Train-time WER evaluation as the scheduler metric (the
    reference's custom_evaluate, cat/ctc/train.py:213-281: dev WER via
    beam decode gathered across ranks). Enable with
    hyper["train"]["option"]["eval_wer"] = true or {"beam_width": N}.
    Returns a callable(state) -> WER%, or None when disabled."""
    cfg = opts.get("eval_wer")
    if not cfg:
        return None
    if not isinstance(cfg, dict):
        cfg = {}
    import jax
    import jax.numpy as jnp

    from cat_tpu.utils.data import BucketedLoader
    from cat_tpu.utils.wer import wer as wer_fn

    beam = int(cfg.get("beam_width", 1))
    char_level = bool(cfg.get("cer", False))
    is_rnnt = _is_rnnt(hyper)
    # host-split: each process decodes its slice; error/word counts are
    # summed across processes below (cat/ctc/train.py:237-250 role)
    loader = BucketedLoader(dv_ds, shuffle=False,
                            frame_budget=opts.get("frame_budget", 20000),
                            num_buckets=opts.get("num_buckets", 4),
                            multiple_of=max(jax.device_count(), 1)
                            // jax.process_count(),
                            host_index=jax.process_index(),
                            host_count=jax.process_count())

    if is_rnnt:
        from cat_tpu.rnnt.decode import make_greedy_decoder
        greedy = make_greedy_decoder(model)

        def decode_batch(state, b):
            toks, counts = greedy(state, jnp.asarray(b["feats"]),
                                  jnp.asarray(b["feat_lengths"]))
            toks, counts = np.asarray(toks), np.asarray(counts)
            return [list(toks[n, : counts[n]])
                    for n in range(toks.shape[0])]
    else:
        from cat_tpu.ctc.decode import greedy_decode
        from cat_tpu.ctc.decode_jax import ctc_beam_search_device

        @jax.jit
        def apply(variables, x, lens):
            logits, olens = model.apply(variables, x, lens,
                                        deterministic=True)
            return jax.nn.log_softmax(
                logits.astype(jnp.float32), -1), olens

        def decode_batch(state, b):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            lp, olens = apply(variables, jnp.asarray(b["feats"]),
                              jnp.asarray(b["feat_lengths"]))
            if beam > 1:
                # round max_len up to a multiple of 32 so the jitted
                # beam search compiles once per (T-bucket, U-bucket)
                # pair instead of once per distinct label width — at
                # corpus scale the per-eval recompiles otherwise
                # dominate eval time (VERDICT r2 weak 8)
                ml = int(b["labels"].shape[1]) + 8
                prefixes, plens, _ = ctc_beam_search_device(
                    lp, olens, beam_width=beam,
                    max_len=-(-ml // 32) * 32)
                prefixes = np.asarray(prefixes)
                plens = np.asarray(plens)
                return [list(prefixes[n, 0, : plens[n, 0]])
                        for n in range(lp.shape[0])]
            return greedy_decode(lp, olens)

    def eval_metric(state):
        refs, hyps = [], []
        for batch in loader:
            b = batch.asdict()
            dec = decode_batch(state, b)
            w = np.asarray(b["weight"])
            labels = np.asarray(b["labels"])
            llens = np.asarray(b["label_lengths"])
            for n in range(len(dec)):
                if w[n] <= 0:
                    continue
                refs.append(tok.decode(
                    [int(x) for x in labels[n, : llens[n]]]))
                hyps.append(tok.decode([int(x) for x in dec[n]]))
        res = wer_fn(refs, hyps, char_level=char_level)
        if jax.process_count() > 1:
            from cat_tpu.parallel.dist import host_sum

            err = float(host_sum(res["errors"]))
            words = float(host_sum(res["num_words"]))
            return 100.0 * err / max(words, 1.0)
        return res["wer"]

    return eval_metric


def _write_exp_readme(expdir, hyper, config, state, tok):
    """Auto-generated per-experiment readme (param count, device
    inventory) — coreutils.py:102-166 equivalent. Rank-0 write only."""
    import jax

    if jax.process_index() != 0:
        return
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


def _den_from_path(path, tok, use_dense):
    """Load an explicit denominator LM (hyper["den_lm"]["path"]):
    .arpa (unit n-gram), .fst (OpenFST binary den LM), or .npz
    (DenseDen / DenGraph cache, distinguished by keys)."""
    from cat_tpu.fst.graph import DenGraph, build_den_fst
    from cat_tpu.ops.crf import DenDevice
    from cat_tpu.ops.crf_dense import DenseDen

    low = path.lower()
    if low.endswith(".arpa"):
        from cat_tpu.fst.ngram import read_arpa

        with open(path) as f:
            lm = read_arpa(f, to_int=True)
        if use_dense:
            return DenseDen.from_ngram(lm, num_classes=tok.vocab_size)
        return DenDevice.from_graph(DenGraph.from_fst(
            build_den_fst(lm, num_classes=tok.vocab_size)))
    if low.endswith(".fst"):
        from cat_tpu.fst.fst import Fst

        return DenDevice.from_graph(DenGraph.from_fst(
            Fst.read_openfst(path)))
    import numpy as np

    with np.load(path) as z:
        keys = set(z.files)
    if "logw" in keys:  # DenseDen.save layout
        return DenseDen.load(path)
    return DenDevice.from_graph(DenGraph.load(path))


def _shard_label_seqs(pattern):
    """Transcript pre-pass over npz shards: yields each utterance's
    label id sequence, reading only the (small) label arrays."""
    import numpy as np

    from cat_tpu.utils.data_sharded import expand_shards

    shards = expand_shards(pattern)
    if not shards:
        raise FileNotFoundError(pattern)
    for sh in shards:
        with np.load(sh) as z:
            labels, loffs = z["labels"], z["label_offsets"]
            for i in range(len(loffs) - 1):
                yield [int(x) for x in labels[loffs[i]:loffs[i + 1]]]


def build_den(expdir, hyper, tok, tr_ds, shard_pattern=None):
    """Denominator LM for CTC-CRF (prep_den_lm.sh equivalent). Sources,
    in order: cached expdir den_{dense,graph}.npz → explicit
    hyper["den_lm"]["path"] (.arpa/.fst/.npz) → n-gram estimated from
    the packed train transcripts, or — in streaming-shards mode — from
    a label-only pre-pass over the shard files (the reference trains
    its wenetspeech CRF through wds the same way:
    cat/shared/manager.py:100-202). Dense MXU expansion (ops.crf_dense)
    when vocabulary and order permit; arc tables otherwise."""
    from cat_tpu.fst.graph import DenGraph, build_den_fst
    from cat_tpu.fst.ngram import train_ngram
    from cat_tpu.ops.crf import DenDevice
    from cat_tpu.ops.crf_dense import DenseDen

    den_cfg = hyper.get("den_lm", {})
    order = den_cfg.get("order", 3)
    use_dense = order <= 3 and tok.vocab_size <= 128
    dense_path = os.path.join(expdir, "den_dense.npz")
    graph_path = os.path.join(expdir, "den_graph.npz")
    if use_dense and os.path.exists(dense_path):
        return DenseDen.load(dense_path)
    if not use_dense and os.path.exists(graph_path):
        return DenDevice.from_graph(DenGraph.load(graph_path))
    if den_cfg.get("path"):
        return _den_from_path(den_cfg["path"], tok, use_dense)
    if tr_ds is not None:
        seqs = ([int(x) for x in tr_ds[i][1]]
                for i in range(len(tr_ds)))
    elif shard_pattern is not None:
        seqs = _shard_label_seqs(shard_pattern)
    else:
        raise ValueError(
            "CTC-CRF needs a denominator LM: provide hyper "
            '"den_lm": {"path": ...} (.arpa/.fst/.npz), a cached '
            "den_dense.npz/den_graph.npz under the expdir, or a "
            "packed/sharded train set to estimate one from")
    lm = train_ngram(list(seqs), order=order)
    if use_dense:
        den = DenseDen.from_ngram(lm, num_classes=tok.vocab_size)
        den.save(dense_path)
        return den
    g = DenGraph.from_fst(build_den_fst(lm, num_classes=tok.vocab_size))
    g.save(graph_path)
    return DenDevice.from_graph(g)


def _load_decode_state(expdir, hyper):
    """Checkpoint selection + averaging for inference
    (cat/utils/avgmodel.py:20-111 best-N vs last-N semantics, wired
    like asr.py:322-329)."""
    from cat_tpu.utils.checkpoint import (CheckpointManager,
                                          average_checkpoints,
                                          load_checkpoint)

    ckpt = CheckpointManager(os.path.join(expdir, "check"))
    avg = hyper.get("inference", {}).get("avgmodel", {})

    def unpack(st):
        if hasattr(st, "params"):
            return st.params, st.batch_stats
        return st["params"], st.get("batch_stats", {})

    avail = [e for e in ckpt.entries
             if os.path.exists(ckpt.path(e[0]))]
    if not avail:
        raise FileNotFoundError(f"no checkpoints under {ckpt.dir}")
    num = int(avg.get("num", 0))
    mode = avg.get("mode", "best")
    if num > 1:
        if mode == "last":
            # most recent N by step (avgmodel.py last-N)
            chosen = sorted(avail, key=lambda e: e[2])[-num:]
        else:
            # lowest dev metric N (avgmodel.py best-N)
            chosen = sorted(avail, key=lambda e: e[1])[:num]
        paths = [ckpt.path(e[0]) for e in chosen]
        if len(paths) > 1:
            return unpack(average_checkpoints(paths, key="state"))
    best = min(avail, key=lambda e: e[1])[0]
    return unpack(load_checkpoint(ckpt.path(best))["state"])


def _build_wfst_decoder(expdir, hyper, config, tok, dec_cfg):
    """TLG decoding graph from config alone (fst_decode.sh path): G =
    word n-gram over the training transcripts, L = tokenizer spellings,
    T = CTC topo. Cached under expdir."""
    from cat_tpu.fst.decode import WfstDecoder, build_tlg
    from cat_tpu.fst.fst import Fst
    from cat_tpu.fst.ngram import train_ngram

    wf = dec_cfg.get("wfst", {})
    tlg_path = os.path.join(expdir, "tlg.npz")
    word_list_path = os.path.join(expdir, "tlg_words.txt")
    if os.path.exists(tlg_path) and os.path.exists(word_list_path):
        tlg = Fst.load(tlg_path)
        with open(word_list_path) as f:
            words = [w.rstrip("\n") for w in f]
    else:
        tr = hyper["data"]["train"]
        text = read_scp(os.path.join(tr, "text"))
        sents = [t.split() for t in text.values()]
        words = sorted({w for s in sents for w in s})
        word2id = {w: i + 1 for i, w in enumerate(words)}
        wlm = train_ngram(sents, order=wf.get("order", 2))
        # L: word -> its tokenizer units (unit ids double as "phone"
        # symbols, mapped identically onto AM outputs)
        lexicon = [(w, [int(t) for t in tok.encode(w)]) for w in words]
        phone2id = {i: i for i in range(1, tok.vocab_size)}
        tlg = build_tlg(lexicon, wlm, phone2id=phone2id,
                        word2id=word2id, num_classes=tok.vocab_size)
        tlg.save(tlg_path)
        with open(word_list_path, "w") as f:
            f.write("\n".join(words) + "\n")
    id2word = {i + 1: w for i, w in enumerate(words)}
    dec = WfstDecoder(tlg, beam=wf.get("beam", 17.0),
                      max_active=wf.get("max_active", 7000),
                      acoustic_scale=wf.get("acoustic_scale", 1.0),
                      lm_scale=wf.get("lm_scale", 1.0))
    return dec, id2word


def _load_lm_exp(lm_dir):
    """(model, params, tokenizer) from a trained lm-pipeline expdir."""
    from cat_tpu.lm import train as lm_train
    from cat_tpu.utils import tokenizer as tknz
    from cat_tpu.utils.checkpoint import CheckpointManager, load_checkpoint

    lm_hyper = load_json(os.path.join(lm_dir, "hyper-p.json"))
    lm_config = load_json(os.path.join(lm_dir, "config.json"))
    lm_tok = tknz.load(os.path.join(
        lm_dir, lm_hyper["tokenizer"].get("file", "tokenizer.tknz")))
    lm_model = lm_train.build_model(lm_config,
                                    num_classes=lm_tok.vocab_size)
    ckpt = CheckpointManager(os.path.join(lm_dir, "check"))
    st = load_checkpoint(ckpt.path(ckpt.best()))["state"]
    lm_params = st.params if hasattr(st, "params") else st["params"]
    return lm_model, lm_params, lm_tok


def _build_decode_lm(expdir, hyper, tok, dec_cfg):
    """External LM for shallow fusion / LODR at decode, from
    decode: {"lm": {...}, "alpha": α, "beta": β} (the reference's
    --lm-config/--lm-check/--alpha, cat/rnnt/decode.py:285-301).

    Forms of decode["lm"]:
      {"type": "ngram", "order": N}      — token-level n-gram over the
        training transcripts (tokenized with the AM tokenizer);
      {"type": "nn", "exp": DIR}         — neural LM from a trained
        lm-pipeline expdir (must share the AM token vocabulary);
      {"type": "lodr", "nn": {"exp": DIR}, "order": N,
       "ngram_weight": -0.3}             — LODR: NN LM + negatively
        weighted n-gram (decoder.py:705-795 MultiDecoder role).
    Returns a scorer with logp(ctx, tok) in log10, or None."""
    cfg = dec_cfg.get("lm")
    if not cfg:
        return None

    def token_ngram(order):
        from cat_tpu.fst.ngram import train_ngram

        tr = _train_sets(hyper)[0][0]
        text = read_scp(os.path.join(tr, "text"))
        seqs = [[int(t) for t in tok.encode(s)] for s in text.values()]
        return train_ngram(seqs, order=order)

    kind = cfg.get("type", "ngram")
    if kind == "ngram":
        return token_ngram(cfg.get("order", 3))
    if kind == "nn":
        from cat_tpu.lm.scorer import NeuralLMScorer

        lm_model, lm_params, _ = _load_lm_exp(cfg["exp"])
        return NeuralLMScorer(lm_model, lm_params)
    if kind == "lodr":
        from cat_tpu.lm.scorer import NeuralLMScorer
        from cat_tpu.rnnt.decode import CombinedLM

        lm_model, lm_params, _ = _load_lm_exp(cfg["nn"]["exp"])
        nn = NeuralLMScorer(lm_model, lm_params)
        ng = token_ngram(cfg.get("order", 2))
        return CombinedLM([(nn, 1.0),
                           (ng, float(cfg.get("ngram_weight", -0.3)))])
    raise ValueError(f"unknown decode lm type {kind}")


def _maybe_rescore(expdir, hyper, tok, nbest, dec_cfg):
    """Optional n-best LM rescoring (cat/lm/rescore.py:145-200 score =
    am + α·lm + β·len). dec_cfg["rescore"] = {"alpha", "beta",
    "lm": {"type": "ngram", "order": N} | {"type": "nn", "exp": dir}}."""
    rs = dec_cfg.get("rescore")
    if not rs:
        return None
    from cat_tpu.lm.rescore import neural_nll, ngram_nll, rescore_nbest

    lm_cfg = rs.get("lm", {"type": "ngram", "order": 3})
    if lm_cfg.get("type", "ngram") == "ngram":
        # word-level n-gram over the training transcripts (hyps in the
        # n-best list are text, so the LM must be over words too)
        from cat_tpu.fst.ngram import train_ngram

        tr = hyper["data"]["train"]
        text = read_scp(os.path.join(tr, "text"))
        lm = train_ngram([s.split() for s in text.values()],
                         order=lm_cfg.get("order", 3))
        lm_nll = ngram_nll(lm, nbest)
    else:
        # neural LM from a trained lm-pipeline experiment directory
        lm_model, lm_params, lm_tok = _load_lm_exp(lm_cfg["exp"])
        lm_nll = neural_nll(lm_model, lm_params, nbest, lm_tok)
    scored = rescore_nbest(nbest, lm_nll, alpha=rs.get("alpha", 1.0),
                           beta=rs.get("beta", 0.0))
    return {uid: hyp for uid, (score, hyp) in scored.items()}


def stage_decode(expdir, hyper, config, tok):
    """Stage 4: batched on-device decode + n-best dump + WER + RTF.

    Decode mode from hyper["inference"]["decode"]["mode"]:
      "beam" (default) — on-device batched prefix beam search
        (ctc/decode_jax.py), n-best written for rescoring;
      "greedy" — argmax collapse;
      "wfst" — TLG graph decode (fst_decode.sh path) built from config;
      "streaming" — fixed-chunk chunk_infer (cat/ctc/decode.py:189-207
        --streaming) for CUSIDE-trained unified models.
    RNN-T uses the batched beam decoder (fusion/ILM options in
    "decode": {"alpha","beta","ilm_weight"}).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from cat_tpu.utils.data import BucketedLoader, SpeechDataset
    from cat_tpu.utils.nbest import write_nbest
    from cat_tpu.utils.wer import wer

    task = importlib.import_module(hyper["train"]["bin"])
    pkl_dir = os.path.join(expdir, "pkl")
    inf = hyper.get("inference", {})
    test_split = inf.get("split", "dev")
    ds = SpeechDataset(os.path.join(pkl_dir, test_split))
    model = task.build_model(config, num_classes=tok.vocab_size)
    params, batch_stats = _load_decode_state(expdir, hyper)

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    dec_cfg = inf.get("decode", {})
    mode = dec_cfg.get("mode", "beam")
    beam = dec_cfg.get("beam_width", 16)
    nbest_n = int(dec_cfg.get("nbest", min(beam, 8)))
    is_rnnt = _is_rnnt(hyper)
    is_unified = hyper["train"]["bin"].endswith("train_unified")

    # host-split decode: each process handles its slice of every batch,
    # results are gathered before scoring/writing (VERDICT r2 weak 4)
    loader = BucketedLoader(ds, shuffle=False,
                            frame_budget=dec_cfg.get("frame_budget",
                                                     20000),
                            num_buckets=dec_cfg.get("num_buckets", 4),
                            multiple_of=max(jax.device_count(), 1)
                            // jax.process_count(),
                            host_index=jax.process_index(),
                            host_count=jax.process_count())

    wfst_dec = id2word = None
    if mode == "wfst":
        wfst_dec, id2word = _build_wfst_decoder(expdir, hyper, config,
                                                tok, dec_cfg)

    # external LM fusion from config (decode: {"lm": ..., "alpha": ...})
    fusion_lm = _build_decode_lm(expdir, hyper, tok, dec_cfg)

    if is_rnnt:
        from cat_tpu.rnnt.decode import RNNTBeamDecoder
        decoder = RNNTBeamDecoder(
            model, params, beam_width=beam, batch_stats=batch_stats,
            lm=fusion_lm,
            alpha=dec_cfg.get("alpha", 0.0),
            beta=dec_cfg.get("beta", 0.0),
            ilm_weight=dec_cfg.get("ilm_weight", 0.0),
            streaming=(mode == "streaming" and is_unified))
    else:
        if is_unified:
            from cat_tpu.ctc.streaming import chunk_infer

            @jax.jit
            def apply(x, lens):
                out, olens = chunk_infer(
                    model, variables, x, lens,
                    future=dec_cfg.get("future", "simu"))
                return jax.nn.log_softmax(
                    out.astype(jnp.float32), -1), olens
        else:
            @jax.jit
            def apply(x, lens):
                logits, olens = model.apply(variables, x, lens,
                                            deterministic=True)
                return jax.nn.log_softmax(
                    logits.astype(jnp.float32), -1), olens

    hyps, refs = {}, {}
    all_nbest = {}
    audio_s = 0.0
    t0 = _time.time()
    for batch in loader:
        b = batch.asdict()
        w = np.asarray(b["weight"])
        labels = np.asarray(b["labels"])
        llens = np.asarray(b["label_lengths"])
        flens = np.asarray(b["feat_lengths"])
        uids = batch.uids
        if is_rnnt:
            res = decoder.decode(b["feats"], flens, nbest=nbest_n)
            per_utt = [[(s, list(p)) for s, p in r] for r in res]
        else:
            lp, olens = apply(jnp.asarray(b["feats"]),
                              jnp.asarray(flens))
            if mode == "greedy" or (mode == "streaming" and beam <= 1):
                from cat_tpu.ctc.decode import greedy_decode
                per_utt = [[(0.0, seq)]
                           for seq in greedy_decode(lp, olens)]
            elif mode == "wfst":
                lp_np, ol_np = np.asarray(lp), np.asarray(olens)
                # both 1-best and n-best route through the C++
                # token-passing core when it builds (latgen-faster
                # role; K-token n-best for the rescoring pipeline)
                use_native = dec_cfg.get("native", True)
                if use_native:
                    try:
                        from cat_tpu.native import wfst_lib
                        wfst_lib()
                    except Exception:
                        use_native = False
                per_utt = []
                for n in range(lp_np.shape[0]):
                    if w[n] <= 0:
                        per_utt.append([(0.0, [])])
                        continue
                    if use_native and nbest_n == 1:
                        hyp = [wfst_dec.decode_native(lp_np[n],
                                                      ol_np[n])]
                    elif use_native:
                        hyp = wfst_dec.decode_native_nbest(
                            lp_np[n], ol_np[n], nbest=nbest_n)
                    else:
                        hyp = wfst_dec.decode(lp_np[n], ol_np[n],
                                              nbest=nbest_n)
                    per_utt.append([
                        (s, [id2word[i] for i in wids if i in id2word])
                        for s, wids in hyp])
            elif fusion_lm is not None:
                # LM-fused host prefix beam (ctcdecode + LM role,
                # cat/ctc/decode.py --lm): exact fusion needs host-side
                # scoring, one utterance at a time
                from cat_tpu.ctc.decode import prefix_beam_search

                lp_np, ol_np = np.asarray(lp), np.asarray(olens)
                per_utt = []
                for n in range(lp_np.shape[0]):
                    if w[n] <= 0:
                        per_utt.append([(0.0, [])])
                        continue
                    nb = prefix_beam_search(
                        lp_np[n], int(ol_np[n]), beam_width=beam,
                        lm=fusion_lm,
                        alpha=float(dec_cfg.get("alpha", 0.3)),
                        beta=float(dec_cfg.get("beta", 0.0)),
                        nbest=nbest_n)
                    per_utt.append([(s, list(pre)) for s, pre in nb])
            else:  # on-device batched prefix beam
                from cat_tpu.ctc.decode_jax import ctc_beam_search_device
                ml = int(labels.shape[1]) + 16
                prefixes, plens, scores = ctc_beam_search_device(
                    lp, olens, beam_width=beam,
                    max_len=-(-ml // 32) * 32,
                    beta=float(dec_cfg.get("beta", 0.0)))
                prefixes = np.asarray(prefixes)
                plens = np.asarray(plens)
                scores = np.asarray(scores)
                per_utt = [
                    [(float(scores[n, k]),
                      list(prefixes[n, k, : plens[n, k]]))
                     for k in range(min(nbest_n, prefixes.shape[1]))]
                    for n in range(prefixes.shape[0])]
        for n in range(len(per_utt)):
            if w[n] <= 0:
                continue
            uid = uids[n] if uids is not None else str(len(hyps))
            audio_s += float(flens[n]) * 0.01
            entry = {}
            for k, (score, toks) in enumerate(per_utt[n]):
                if toks and isinstance(toks[0], str):
                    text = " ".join(toks)
                else:
                    text = tok.decode([int(t) for t in toks])
                entry[k] = (float(score), text)
            all_nbest[uid] = entry
            hyps[uid] = entry[0][1]
            refs[uid] = tok.decode([int(x) for x in labels[n, :llens[n]]])
    wall = _time.time() - t0

    if jax.process_count() > 1:
        # merge per-host slices so every process scores the full set
        from cat_tpu.parallel.dist import all_gather_host_objects

        parts = all_gather_host_objects((refs, hyps, all_nbest, audio_s))
        refs, hyps, all_nbest = {}, {}, {}
        audio_s = 0.0
        for r, h, nb, a in parts:
            refs.update(r)
            hyps.update(h)
            all_nbest.update(nb)
            audio_s += a

    rescored = _maybe_rescore(expdir, hyper, tok, all_nbest, dec_cfg)
    if rescored is not None:
        hyps = rescored

    return finalize_decode(expdir, test_split, refs, hyps, all_nbest,
                           wall, audio_s, mode, dec_cfg)


def finalize_decode(expdir, split, refs, hyps, all_nbest, wall, audio_s,
                    mode, dec_cfg):
    """Shared stage-4 epilogue: n-best dump + WER/RTF + result files
    (used by the default path and every task adapter). Every process
    computes the result; only process 0 writes/prints."""
    import jax

    from cat_tpu.utils.nbest import write_nbest
    from cat_tpu.utils.wer import wer

    res = wer(refs, hyps, char_level=dec_cfg.get("cer", False))
    res["rtf"] = wall / max(audio_s, 1e-6) if audio_s > 0 else 0.0
    res["mode"] = mode
    if jax.process_index() == 0:
        write_nbest(all_nbest, os.path.join(expdir, f"nbest_{split}.pkl"))
        with open(os.path.join(expdir, f"decode_{split}.txt"), "w") as f:
            for uid in sorted(hyps):
                f.write(f"{uid}\t{hyps[uid]}\n")
        with open(os.path.join(expdir, f"wer_{split}.json"), "w") as f:
            json.dump(res, f, indent=1)
        print(f"WER {res['wer']:.2f}% "
              f"(sub {res['sub']} ins {res['ins']} del {res['del']}) "
              f"RTF {res['rtf']:.4f} [{mode}]")
    return res


def main(argv=None):
    p = argparse.ArgumentParser("cat_tpu.pipeline.asr")
    p.add_argument("expdir")
    p.add_argument("--start_stage", type=int, default=1)
    p.add_argument("--stop_stage", type=int, default=4)
    args = p.parse_args(argv)
    hyper = load_json(os.path.join(args.expdir, "hyper-p.json"))
    config = load_json(os.path.join(args.expdir, "config.json"))

    # perf-feature flags from config (env vars still override — see
    # utils/flags.py): config.json {"perf": {"fused_ffn": "1", ...}}
    if config.get("perf"):
        from cat_tpu.utils.flags import set_flags
        set_flags(**config["perf"])

    # task adapter: ME2E / JSA-SPG / LLM-P2G bins plug their own pack/
    # train/decode behind the uniform 4-stage contract (the reference
    # drives these through one pipeline via its Manager variants,
    # cat/utils/pipeline/common_utils.py:483-486)
    from cat_tpu.pipeline import tasks

    task = tasks.get_task(hyper)
    toks = load_tokenizers(args.expdir, hyper)
    tok = toks.get("tokenizer")
    print(f"[stage 1] tokenizer(s) ready: "
          + ", ".join(f"{k}={v.vocab_size}" for k, v in toks.items()))
    if args.stop_stage < 2:
        return
    if args.start_stage <= 2:
        if task is not None:
            task.pack(args.expdir, hyper, toks)
        else:
            stage_pack(args.expdir, hyper, tok)
        print("[stage 2] data packed")
    if args.start_stage <= 3 <= args.stop_stage:
        if task is not None:
            task.train(args.expdir, hyper, config, toks)
        else:
            stage_train(args.expdir, hyper, config, tok)
        print("[stage 3] training done")
    if args.start_stage <= 4 <= args.stop_stage:
        if task is not None:
            task.decode(args.expdir, hyper, config, toks)
        else:
            stage_decode(args.expdir, hyper, config, tok)
        print("[stage 4] decode done")


if __name__ == "__main__":
    main()
