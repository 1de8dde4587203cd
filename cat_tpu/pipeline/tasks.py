"""Pipeline task adapters: one uniform 4-stage contract for every
train bin the recipes name.

The reference drives ME2E / JSA-SPG / LLM-P2G through the same asr
pipeline via Manager variants and a uniform trainer interface
(/root/reference/cat/utils/pipeline/common_utils.py:483-486,
cat/shared/manager_wo.py:78-95, manager_jsa.py:34). Here each special
bin gets a TaskAdapter implementing:

  tokenizer_corpus_file(key) — which data column trains tokenizer `key`
  pack(expdir, hyper, toks)  — stage 2: what lands in expdir/pkl
  train(expdir, hyper, config, toks) — stage 3: build + Manager.run
  decode(expdir, hyper, config, toks) — stage 4: task decode + WER

Bins with the standard (feats → encoder → loss) shape stay on the
default path in pipeline/asr.py.
"""
from __future__ import annotations

import importlib
import json
import os
import time

import numpy as np


def get_task(hyper):
    b = hyper.get("train", {}).get("bin", "")
    cls = _TASKS.get(b)
    return cls() if cls is not None else None


def _asr():
    from cat_tpu.pipeline import asr
    return asr


def _split_dirs(hyper):
    """[(split, datadir)] for dev + train set(s), like stage_pack."""
    asr = _asr()
    sets = [("dev", hyper["data"]["dev"])]
    trs = asr._train_sets(hyper)
    if len(trs) == 1:
        sets.append(("train", trs[0][0]))
    else:
        sets.extend((f"train_{i}", p) for i, (p, _) in enumerate(trs))
    return sets


def _loader_common(opts, decode=False):
    import jax

    return dict(multiple_of=max(jax.device_count(), 1),
                host_index=jax.process_index() if not decode else 0,
                host_count=jax.process_count() if not decode else 1,
                num_buckets=opts.get("num_buckets", 4))


def _run_manager(expdir, hyper, config, state, train_step, eval_step,
                 train_loader, eval_loader, sched, tok, model_state=None,
                 batch_transform=None, eval_metric=None):
    import jax

    from cat_tpu.utils.checkpoint import CheckpointManager
    from cat_tpu.utils.manager import Manager

    asr = _asr()
    opts = hyper["train"].get("option", {})
    mgr = Manager(train_step=train_step, eval_step=eval_step, state=state,
                  scheduler=sched,
                  ckpt=CheckpointManager(os.path.join(expdir, "check")),
                  train_loader=train_loader, eval_loader=eval_loader,
                  max_epochs=opts.get("max_epochs", 100),
                  check_freq=opts.get("check_freq", -1),
                  batch_transform=batch_transform,
                  eval_metric=eval_metric)
    asr._write_exp_readme(expdir, hyper, config,
                          model_state or state, tok)
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


class Me2eTask:
    """Multichannel end-to-end CTC (reference cat/ctc/train_me2e.py +
    manager_wo; recipe egs/aishell4). Packs raw array waveforms (L, C)
    time-major; the trainers transpose to (N, C, L) inside jit."""

    bin = "cat_tpu.ctc.train_me2e"
    chunk = False

    def tokenizer_corpus_file(self, key):
        return "text"

    def pack(self, expdir, hyper, toks):
        from cat_tpu.utils.audio import read_wav
        from cat_tpu.utils.data import pack_speech_data

        asr = _asr()
        tok = toks["tokenizer"]
        channels = int(hyper.get("feature", {}).get("channels", 1))
        pkl_dir = os.path.join(expdir, "pkl")
        for split, datadir in _split_dirs(hyper):
            out = os.path.join(pkl_dir, split)
            if os.path.exists(os.path.join(out, "meta.npz")):
                continue
            if os.path.exists(os.path.join(datadir, "meta.npz")):
                os.makedirs(pkl_dir, exist_ok=True)
                if not os.path.exists(out):
                    os.symlink(os.path.abspath(datadir), out)
                continue

            def gen():
                scp = asr.read_scp(os.path.join(datadir, "wav.scp"))
                text = asr.read_scp(os.path.join(datadir, "text"))
                for uid, path in scp.items():
                    wave, sr = read_wav(path, mono=False)
                    if wave.ndim == 1:  # mono source: replicate
                        wave = np.tile(wave[:, None], (1, channels))
                    yield uid, wave.astype(np.float32), text.get(uid, "")

            pack_speech_data(out, gen(), tok)
        return pkl_dir

    def _loaders(self, expdir, hyper, config, hop):
        from cat_tpu.utils.data import BucketedLoader, SpeechDataset

        opts = hyper["train"].get("option", {})
        pkl = os.path.join(expdir, "pkl")
        tr = SpeechDataset(os.path.join(pkl, "train"))
        dv = SpeechDataset(os.path.join(pkl, "dev"))
        kw = _loader_common(opts)
        # frame_budget is in SAMPLES for raw-wave data; the feasibility
        # filter must see output frames: hop × encoder subsampling (4)
        kw.update(frame_budget=opts.get("frame_budget", 640000),
                  feasibility_divisor=hop * 4)
        return (tr, dv,
                BucketedLoader(tr, seed=opts.get("seed", 0), **kw),
                BucketedLoader(dv, shuffle=False, **kw))

    def train(self, expdir, hyper, config, toks):
        from cat_tpu.utils.scheduler import build_scheduler

        task = importlib.import_module(hyper["train"]["bin"])
        tok = toks["tokenizer"]
        model = task.build_model(config, num_classes=tok.vocab_size)
        hop = model.frontend.frame_shift
        tr, dv, tr_loader, dv_loader = self._loaders(expdir, hyper,
                                                     config, hop)
        sched, tx = build_scheduler(config["scheduler"])
        state = task.init_state(model, tx, num_channels=tr.feat_dim)
        trainer_cfg = config.get("trainer", {})
        extra = {}
        if self.chunk:
            extra = dict(lamb_chunk=trainer_cfg.get("lamb_chunk", 0.5),
                         lamb_simu=trainer_cfg.get("lamb_simu", 1.0),
                         future=trainer_cfg.get("future", "simu"))
        train_step = task.make_train_step(
            model, tx, grad_clip=trainer_cfg.get("grad_clip", 5.0),
            channels_last=True, **extra)
        extra.pop("lamb_simu", None)
        eval_step = task.make_eval_step(model, channels_last=True,
                                        **extra)
        return _run_manager(expdir, hyper, config, state, train_step,
                            eval_step, tr_loader, dv_loader, sched, tok)

    def decode(self, expdir, hyper, config, toks):
        import jax

        from cat_tpu.ctc.decode_me2e import make_me2e_decoder
        from cat_tpu.utils.data import BucketedLoader, SpeechDataset

        asr = _asr()
        task = importlib.import_module(hyper["train"]["bin"])
        tok = toks["tokenizer"]
        inf = hyper.get("inference", {})
        dec_cfg = inf.get("decode", {})
        split = inf.get("split", "dev")
        model = task.build_model(config, num_classes=tok.vocab_size)
        params, batch_stats = asr._load_decode_state(expdir, hyper)
        hop = model.frontend.frame_shift
        ds = SpeechDataset(os.path.join(expdir, "pkl", split))
        kw = _loader_common(dec_cfg, decode=True)
        kw.update(frame_budget=dec_cfg.get("frame_budget", 640000),
                  feasibility_divisor=hop * 4)
        loader = BucketedLoader(ds, shuffle=False, **kw)
        mode = dec_cfg.get("mode", "offline")
        dec = make_me2e_decoder(
            model, params, batch_stats=batch_stats,
            mode="streaming" if mode == "streaming" else "offline",
            beam_width=dec_cfg.get("beam_width", 8),
            future=dec_cfg.get("future", "simu"),
            beta=float(dec_cfg.get("beta", 0.0)), channels_last=True)
        sr = float(hyper.get("feature", {}).get("sample_rate", 16000))
        nbest_n = int(dec_cfg.get("nbest", 1))
        refs, hyps, all_nbest = {}, {}, {}
        audio_s = 0.0
        t0 = time.time()
        for batch in loader:
            res = dec(batch.feats, batch.feat_lengths, nbest=nbest_n,
                      max_len=int(batch.labels.shape[1]) + 16)
            w = batch.weight
            for n in range(len(res)):
                if w[n] <= 0:
                    continue
                uid = batch.uids[n]
                audio_s += float(batch.feat_lengths[n]) / sr
                entry = {k: (float(s), tok.decode([int(t) for t in seq]))
                         for k, (s, seq) in enumerate(res[n])}
                all_nbest[uid] = entry
                hyps[uid] = entry[0][1]
                refs[uid] = tok.decode(
                    [int(x) for x in
                     batch.labels[n, : batch.label_lengths[n]]])
        wall = time.time() - t0
        return asr.finalize_decode(expdir, split, refs, hyps, all_nbest,
                                   wall, audio_s, mode, dec_cfg)


class Me2eChunkTask(Me2eTask):
    bin = "cat_tpu.ctc.train_me2e_chunk"
    chunk = True


class JsaTask:
    """JSA-SPG (reference cat/ctc/train_jsa.py + manager_jsa.py; recipe
    egs/jsa-spg): dual phoneme/grapheme vocabularies, MIS sampling in
    the train step, cascade/marginalized decoding."""

    def tokenizer_corpus_file(self, key):
        return "text"

    def pack(self, expdir, hyper, toks):
        """Features as usual, labels = GRAPHEME ids; optional
        `text_phone` column → phones.json (supervised substitution)."""
        from cat_tpu.utils.data import pack_speech_data

        asr = _asr()
        tok_g = toks["tokenizer_grapheme"]
        tok_p = toks["tokenizer"]
        feat_cfg = hyper.get("feature", {})
        pkl_dir = os.path.join(expdir, "pkl")
        for split, datadir in _split_dirs(hyper):
            out = os.path.join(pkl_dir, split)
            if not os.path.exists(os.path.join(out, "meta.npz")):
                if os.path.exists(os.path.join(datadir, "meta.npz")):
                    os.makedirs(pkl_dir, exist_ok=True)
                    if not os.path.exists(out):
                        os.symlink(os.path.abspath(datadir), out)
                else:
                    pack_speech_data(
                        out, asr.extract_features(datadir, feat_cfg),
                        tok_g)
            phone_file = os.path.join(datadir, "text_phone")
            sup_path = os.path.join(out, "phones.json")
            if os.path.exists(phone_file) and \
                    not os.path.exists(sup_path):
                sup = {uid: [int(x) for x in tok_p.encode(t)]
                       for uid, t in asr.read_scp(phone_file).items()}
                with open(sup_path, "w") as f:
                    json.dump(sup, f)
        return pkl_dir

    def _build_trainer(self, hyper, config, toks, feat_dim):
        from cat_tpu.ctc import train_jsa
        from cat_tpu.utils.scheduler import build_scheduler

        opts = hyper["train"].get("option", {})
        trainer_cfg = config.get("trainer", {})
        tok_p, tok_g = toks["tokenizer"], toks["tokenizer_grapheme"]
        s2p, p2g, g2p = train_jsa.build_models(
            config, num_phonemes=tok_p.vocab_size,
            num_graphemes=tok_g.vocab_size)
        sched, tx = build_scheduler(config["scheduler"])
        trainer = train_jsa.JsaTrainer(
            s2p, p2g, g2p, tx, feat_dim=feat_dim,
            num_phonemes=tok_p.vocab_size,
            num_graphemes=tok_g.vocab_size,
            num_samples=opts.get("num_samples", 4),
            beam_width=opts.get("sample_beam", 8),
            upsample=trainer_cfg.get("upsample", 2))
        return trainer, sched

    def train(self, expdir, hyper, config, toks):
        from cat_tpu.ctc import train_jsa
        from cat_tpu.utils.data import BucketedLoader, SpeechDataset

        opts = hyper["train"].get("option", {})
        pkl = os.path.join(expdir, "pkl")
        tr = SpeechDataset(os.path.join(pkl, "train"))
        dv = SpeechDataset(os.path.join(pkl, "dev"))
        kw = _loader_common(opts)
        kw.update(frame_budget=opts.get("frame_budget", 20000))
        tr_loader = BucketedLoader(tr, seed=opts.get("seed", 0), **kw)
        dv_loader = BucketedLoader(dv, shuffle=False, **kw)
        trainer, sched = self._build_trainer(hyper, config, toks,
                                             tr.feat_dim)
        supervised_z = None
        sup_path = os.path.join(pkl, "train", "phones.json")
        if os.path.exists(sup_path):
            with open(sup_path) as f:
                supervised_z = json.load(f)
        state, train_step, eval_step = train_jsa.manager_steps(
            trainer, supervised_z)
        return _run_manager(expdir, hyper, config, state, train_step,
                            eval_step, tr_loader, dv_loader, sched,
                            toks["tokenizer_grapheme"],
                            batch_transform=lambda b: b)

    def decode(self, expdir, hyper, config, toks):
        from cat_tpu.ctc import train_jsa
        from cat_tpu.ctc.decode_jsa import JsaCascadeDecoder
        from cat_tpu.utils.data import SpeechDataset

        asr = _asr()
        tok_p, tok_g = toks["tokenizer"], toks["tokenizer_grapheme"]
        inf = hyper.get("inference", {})
        dec_cfg = inf.get("decode", {})
        split = inf.get("split", "dev")
        trainer_cfg = config.get("trainer", {})
        s2p, p2g, _ = train_jsa.build_models(
            config, num_phonemes=tok_p.vocab_size,
            num_graphemes=tok_g.vocab_size)
        params, _ = asr._load_decode_state(expdir, hyper)
        dec = JsaCascadeDecoder(
            s2p, p2g, params["s2p"], params["p2g"],
            upsample=trainer_cfg.get("upsample", 2),
            s2p_beam=dec_cfg.get("beam_width", 8),
            p2g_beam=dec_cfg.get("beam_width", 8),
            num_z=dec_cfg.get("num_z", 4))
        marginalize = bool(dec_cfg.get("marginalize", True))
        ds = SpeechDataset(os.path.join(expdir, "pkl", split))
        refs, hyps, all_nbest = {}, {}, {}
        audio_s = 0.0
        t0 = time.time()
        for i in range(len(ds)):
            feats, labels = ds[i]
            uid = ds.uids[i]
            audio_s += feats.shape[0] * 0.01
            ranked = dec.decode(feats, feats.shape[0],
                                marginalize=marginalize)
            entry = {k: (float(s), tok_g.decode([int(t) for t in seq]))
                     for k, (s, seq) in enumerate(ranked[:4])} \
                or {0: (0.0, "")}
            all_nbest[uid] = entry
            hyps[uid] = entry[0][1]
            refs[uid] = tok_g.decode([int(x) for x in labels])
        wall = time.time() - t0
        mode = "marginalize" if marginalize else "cascade"
        return asr.finalize_decode(expdir, split, refs, hyps, all_nbest,
                                   wall, audio_s, mode, dec_cfg)


class P2gTask:
    """LLM-P2G (reference egs/llm-p2g): seq2seq P2G with DANP (CE over
    noisy K-best phonemes) or TKM/SKM marginalized training. Data dirs
    carry `src` (uid + phoneme tokens), `text` (uid + transcript) and —
    for TKM — `src_nbest` (uid score phoneme tokens, K lines/utt), the
    offline product of an S2P model's beam/sampled n-best."""

    def tokenizer_corpus_file(self, key):
        # the primary tokenizer covers phoneme sources, not transcripts
        return "src" if key == "tokenizer" else "text"

    def _mode(self, hyper):
        return hyper["train"].get("option", {}).get("mode", "ce")

    def pack(self, expdir, hyper, toks):
        from cat_tpu.utils.data import pack_seq2seq

        asr = _asr()
        tok_s = toks["tokenizer"]
        tok_t = toks["tokenizer_grapheme"]
        pkl_dir = os.path.join(expdir, "pkl")
        for split, datadir in _split_dirs(hyper):
            out = os.path.join(pkl_dir, split)
            if os.path.exists(os.path.join(out, "seq2seq.npz")):
                continue
            src = asr.read_scp(os.path.join(datadir, "src"))
            text = asr.read_scp(os.path.join(datadir, "text"))
            nbest = {}
            nb_path = os.path.join(datadir, "src_nbest")
            if os.path.exists(nb_path):
                with open(nb_path) as f:
                    for line in f:
                        parts = line.split()
                        if len(parts) < 2:
                            continue
                        uid, score = parts[0], float(parts[1])
                        cand = tok_s.encode(" ".join(parts[2:]))
                        nbest.setdefault(uid, []).append((score, cand))

            def gen():
                for uid, s in src.items():
                    if uid not in text:
                        continue
                    yield (uid, tok_s.encode(s), tok_t.encode(text[uid]),
                           nbest.get(uid))

            pack_seq2seq(out, gen())
        return pkl_dir

    def train(self, expdir, hyper, config, toks):
        from cat_tpu.p2g import train as p2g_train
        from cat_tpu.utils.data import Seq2SeqDataset, Seq2SeqLoader
        from cat_tpu.utils.scheduler import build_scheduler

        opts = hyper["train"].get("option", {})
        mode = self._mode(hyper)
        pkl = os.path.join(expdir, "pkl")
        tr = Seq2SeqDataset(os.path.join(pkl, "train"))
        dv = Seq2SeqDataset(os.path.join(pkl, "dev"))
        if mode in ("tkm", "skm") and not tr.has_nbest:
            raise ValueError(
                "TKM/SKM training needs candidate sets: provide a "
                "`src_nbest` file in the train data dir (offline S2P "
                "n-best, egs/llm-p2g data prep)")
        kw = _loader_common(opts)
        kw.update(frame_budget=opts.get("frame_budget", 2048))
        k = hyper.get("tkm", {}).get("k")
        tr_loader = Seq2SeqLoader(tr, seed=opts.get("seed", 0),
                                  num_cands=k, **kw)
        dv_loader = Seq2SeqLoader(dv, shuffle=False, num_cands=k, **kw)
        tok_s, tok_t = toks["tokenizer"], toks["tokenizer_grapheme"]
        model = p2g_train.build_model(config, src_vocab=tok_s.vocab_size,
                                      tgt_vocab=tok_t.vocab_size)
        sched, tx = build_scheduler(config["scheduler"])
        state = p2g_train.init_state(model, tx)
        train_step = p2g_train.make_train_step(
            model, tx, mode=mode, t_weight=opts.get("t_weight", 1.0),
            label_smoothing=opts.get("label_smoothing", 0.0))
        eval_mode = mode if (mode in ("tkm", "skm") and dv.has_nbest) \
            else "ce"
        eval_step = p2g_train.make_eval_step(
            model, mode=eval_mode, t_weight=opts.get("t_weight", 1.0))
        return _run_manager(expdir, hyper, config, state, train_step,
                            eval_step, tr_loader, dv_loader, sched,
                            tok_t,
                            batch_transform=p2g_train.batch_to_step)

    def decode(self, expdir, hyper, config, toks):
        import jax.numpy as jnp

        from cat_tpu.p2g import train as p2g_train
        from cat_tpu.utils.data import Seq2SeqDataset, Seq2SeqLoader

        asr = _asr()
        tok_s, tok_t = toks["tokenizer"], toks["tokenizer_grapheme"]
        inf = hyper.get("inference", {})
        dec_cfg = inf.get("decode", {})
        split = inf.get("split", "dev")
        ds = Seq2SeqDataset(os.path.join(expdir, "pkl", split))
        kw = _loader_common(dec_cfg, decode=True)
        kw.update(frame_budget=dec_cfg.get("frame_budget", 2048))
        loader = Seq2SeqLoader(ds, shuffle=False,
                               num_cands=hyper.get("tkm", {}).get("k"),
                               **kw)
        model = p2g_train.build_model(config, src_vocab=tok_s.vocab_size,
                                      tgt_vocab=tok_t.vocab_size)
        params, _ = asr._load_decode_state(expdir, hyper)
        variables = {"params": params}
        max_len = int(dec_cfg.get("max_len", 64))
        marginalize = bool(dec_cfg.get("marginalize", False)) \
            and ds.has_nbest
        t_weight = float(hyper.get("tkm", {}).get("temperature",
                                                  dec_cfg.get(
                                                      "t_weight", 1.0)))
        refs, hyps, all_nbest = {}, {}, {}
        t0 = time.time()
        for batch in loader:
            if marginalize:
                texts = self._decode_marginalized(
                    model, variables, batch, max_len, t_weight, tok_t)
            else:
                toks_out, lens = p2g_train.greedy_generate(
                    model, variables, jnp.asarray(batch.src),
                    jnp.asarray(batch.src_lens), max_len=max_len)
                toks_out, lens = np.asarray(toks_out), np.asarray(lens)
                texts = [tok_t.decode(
                    [int(t) for t in toks_out[n, : lens[n]]])
                    for n in range(toks_out.shape[0])]
            for n, text in enumerate(texts):
                if batch.weight[n] <= 0:
                    continue
                uid = batch.uids[n]
                hyps[uid] = text
                all_nbest[uid] = {0: (0.0, text)}
                refs[uid] = tok_t.decode(
                    [int(x) for x in
                     batch.tgt[n, : batch.tgt_lens[n]]])
        wall = time.time() - t0
        mode = "marginalize" if marginalize else "greedy"
        return asr.finalize_decode(expdir, split, refs, hyps, all_nbest,
                                   wall, 0.0, mode, dec_cfg)

    def _decode_marginalized(self, model, variables, batch, max_len,
                             t_weight, tok_t):
        """TKM decoding: greedy-generate one hypothesis per candidate,
        then rescore each by log Σ_k w_k p(y_j|x_k) and keep the best
        (egs/llm-p2g TKM decoding role)."""
        import jax.numpy as jnp

        from cat_tpu.p2g import train as p2g_train

        N, K, Tp = batch.cands.shape
        gens, glens = [], []
        for k in range(K):
            g, gl = p2g_train.greedy_generate(
                model, variables, jnp.asarray(batch.cands[:, k]),
                jnp.asarray(batch.cand_lens[:, k]), max_len=max_len)
            gens.append(np.asarray(g))
            glens.append(np.asarray(gl))
        hyp = np.stack(gens, axis=1)       # (N, K, U)
        hyp_lens = np.stack(glens, axis=1)  # (N, K)
        scores = p2g_train.marginalized_rescore(
            model, variables, jnp.asarray(batch.cands),
            jnp.asarray(batch.cand_lens),
            jnp.asarray(batch.cand_scores), jnp.asarray(hyp),
            jnp.asarray(hyp_lens), t_weight=t_weight)
        best = np.asarray(jnp.argmax(scores, axis=1))
        return [tok_t.decode(
            [int(t) for t in hyp[n, best[n], : hyp_lens[n, best[n]]]])
            for n in range(N)]


class Me2eKaldiTask(Me2eTask):
    bin = "cat_tpu.ctc.train_me2e_kaldi"


class Me2eKaldiChunkTask(Me2eChunkTask):
    bin = "cat_tpu.ctc.train_me2e_kaldi_chunk"


_TASKS = {
    "cat_tpu.ctc.train_me2e": Me2eTask,
    "cat_tpu.ctc.train_me2e_chunk": Me2eChunkTask,
    "cat_tpu.ctc.train_me2e_kaldi": Me2eKaldiTask,
    "cat_tpu.ctc.train_me2e_kaldi_chunk": Me2eKaldiChunkTask,
    "cat_tpu.ctc.train_jsa": JsaTask,
    "cat_tpu.p2g.train": P2gTask,
}
