"""Offline data preparation CLI: manifest → fbank+CMVN(+speed-perturb)
→ packed memmap data or streaming npz shards.

Counterpart of the reference's cat/utils/data/data_prep.py:33-370
(torchaudio fbank, CMVN, speed perturbation, kaldi ark writing) driven
per dataset by egs/<dataset>/local/data.sh. TPU-native differences: the
output is this framework's packed memmap format (utils/data.py) or npz
shards for streaming training (utils/data_sharded.py) instead of kaldi
ark; fbank/CMVN/resampling are the jit-able ops from ops/fbank.py, so
prep-time and train-time features are bit-identical.

Manifest layout (what every egs/<dataset>/local/prepare.py emits):
    wav.scp    uid <abs wav path>
    text       uid <transcript>
    segments   uid recid start_sec end_sec     (optional, kaldi-style)

Usage:
    python -m cat_tpu.utils.data_prep <datadir> <out> \
        --tokenizer exp/tokenizer.tknz [--format packed|shards]
        [--num-mel-bins 80] [--speed-perturb 0.9 1.1]
        [--shard-size 500]

The tokenizer comes first (pipeline stage 1 — or any saved .tknz);
like the reference, speed-perturbed copies get `sp{factor}-` uid
prefixes and only augment training sets.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def read_manifest(datadir):
    """wav.scp + text (+ optional segments) → list of
    (uid, wav_path, transcript, start_sec, end_sec); start/end are
    None without a segments file."""
    def read_kv(path):
        out = {}
        with open(path) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if len(parts) == 2:
                    out[parts[0]] = parts[1]
        return out

    scp = read_kv(os.path.join(datadir, "wav.scp"))
    text = read_kv(os.path.join(datadir, "text"))
    seg_path = os.path.join(datadir, "segments")
    entries = []
    if os.path.exists(seg_path):
        with open(seg_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                uid, rec, s, e = parts
                if uid in text and rec in scp:
                    entries.append((uid, scp[rec], text[uid],
                                    float(s), float(e)))
    else:
        for uid, path in scp.items():
            if uid in text:
                entries.append((uid, path, text[uid], None, None))
    return entries


def features_iter(entries, num_mel_bins=80, speed_perturb=(),
                  channels=0):
    """Yields (uid, feats (T, F) f32, transcript) — or, with
    channels > 0 (ME2E raw-wave prep), (uid, wave (L, C) f32,
    transcript). Speed-perturbed copies are sample-rate resampled
    (ops/fbank.py speed_perturb_resample), uids prefixed `sp{f}-`
    (the reference's sp0.9-/sp1.1- convention)."""
    import jax.numpy as jnp

    from cat_tpu.ops.fbank import cmvn, log_fbank, speed_perturb_resample
    from cat_tpu.utils.audio import read_wav

    factors = [None] + [f for f in speed_perturb
                        if abs(f - 1.0) > 1e-6]
    for uid, path, trans, start, end in entries:
        wav, sr = read_wav(path, mono=(channels == 0))
        if start is not None:
            lo, hi = int(start * sr), int(end * sr)
            wav = wav[lo:hi] if wav.ndim == 1 else wav[lo:hi, :]
        if wav.shape[0] < 16:
            continue
        for f in factors:
            w = wav
            u = uid
            if f is not None:
                # resample on the time axis (host-side numpy)
                w = (speed_perturb_resample(w.T, f).T if w.ndim == 2
                     else speed_perturb_resample(w, f))
                w = np.ascontiguousarray(w, np.float32)
                u = f"sp{f}-{uid}"
            if channels > 0:
                if w.ndim == 1:
                    w = np.tile(w[:, None], (1, channels))
                yield u, np.ascontiguousarray(w[:, :channels],
                                              np.float32), trans
                continue
            feats = log_fbank(jnp.asarray(w[None]),
                              num_bins=num_mel_bins, sample_rate=sr,
                              frame_length=int(sr * 0.025),
                              frame_shift=int(sr * 0.010), fft_size=512)
            feats = cmvn(feats)
            yield u, np.asarray(feats[0]), trans


def prepare(datadir, out, tokenizer, fmt="packed", num_mel_bins=80,
            speed_perturb=(), shard_size=500, channels=0):
    entries = read_manifest(datadir)
    if not entries:
        raise FileNotFoundError(f"no utterances under {datadir}")
    it = features_iter(entries, num_mel_bins=num_mel_bins,
                       speed_perturb=speed_perturb, channels=channels)
    if fmt == "shards":
        from cat_tpu.utils.data_sharded import write_shards

        n = write_shards(out, it, tokenizer, shard_size=shard_size)
        print(f"{out}: {n} shards")
        return n
    from cat_tpu.utils.data import pack_speech_data

    pack_speech_data(out, it, tokenizer)
    print(f"{out}: packed")
    return 1


def main(argv=None):
    p = argparse.ArgumentParser(
        description="manifest dir (wav.scp/text[/segments]) -> "
                    "fbank+CMVN -> packed data or npz shards")
    p.add_argument("datadir")
    p.add_argument("out")
    p.add_argument("--tokenizer", required=True,
                   help="saved .tknz (pipeline stage 1)")
    p.add_argument("--format", choices=("packed", "shards"),
                   default="packed")
    p.add_argument("--num-mel-bins", type=int, default=80)
    p.add_argument("--speed-perturb", type=float, nargs="*",
                   default=[], help="e.g. 0.9 1.1 (train sets only)")
    p.add_argument("--shard-size", type=int, default=500)
    p.add_argument("--channels", type=int, default=0,
                   help=">0: pack raw multichannel waves (ME2E prep) "
                        "instead of fbank")
    a = p.parse_args(argv)
    from cat_tpu.utils import tokenizer as tknz

    tok = tknz.load(a.tokenizer)
    prepare(a.datadir, a.out, tok, fmt=a.format,
            num_mel_bins=a.num_mel_bins,
            speed_perturb=tuple(a.speed_perturb),
            shard_size=a.shard_size, channels=a.channels)


if __name__ == "__main__":
    main()
