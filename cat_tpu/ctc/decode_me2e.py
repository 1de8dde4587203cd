"""Multichannel E2E decode (beamformer frontend + CTC decode).

Counterpart of /root/reference/cat/ctc/decode_me2e.py (producer/worker/
writer multiprocessing, bs=1 hard-coded) — redesigned TPU-style: the
beamformer + encoder run as ONE jitted batched program; the prefix beam
search is the on-device batched kernel (ctc/decode_jax.py). Supports
offline (full-utterance frontend) and streaming (bf_chunk_infer,
train_me2e_chunk.py:64-229) modes.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def make_me2e_decoder(model, params, batch_stats=None, mode="offline",
                      beam_width=8, future="simu", beta=0.0,
                      channels_last=False):
    """Returns decode(wave (N, C, L), wave_lengths) ->
    list[list[(score, [token ids])]] best-first per utterance.
    channels_last: wave arrives (N, L, C) (packed layout)."""
    from cat_tpu.ctc.decode_jax import ctc_beam_search_device

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def apply(wave, wlens):
        if channels_last:
            wave = jnp.swapaxes(wave, 1, 2)
        if mode == "streaming":
            from cat_tpu.ctc.train_me2e_chunk import bf_chunk_infer

            logits, olens = bf_chunk_infer(model, variables, wave,
                                           wlens, future=future)
        else:
            logits, olens = model.apply(variables, wave, wlens,
                                        deterministic=True)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), olens

    def decode(wave, wave_lengths, nbest=1, max_len=128):
        lp, olens = apply(jnp.asarray(wave), jnp.asarray(wave_lengths))
        if beam_width <= 1:
            from cat_tpu.ctc.decode import greedy_decode

            seqs = greedy_decode(lp, olens)
            return [[(0.0, list(s))] for s in seqs]
        prefixes, plens, scores = ctc_beam_search_device(
            lp, olens, beam_width=beam_width, max_len=max_len,
            beta=beta)
        prefixes = np.asarray(prefixes)
        plens = np.asarray(plens)
        scores = np.asarray(scores)
        out = []
        for n in range(prefixes.shape[0]):
            out.append([
                (float(scores[n, k]),
                 [int(t) for t in prefixes[n, k, : plens[n, k]]])
                for k in range(min(nbest, prefixes.shape[1]))])
        return out

    return decode


def decode_scp(model, params, utterances, tokenizer, batch_stats=None,
               mode="offline", beam_width=8, future="simu",
               batch_size=4):
    """Decode a list of (uid, wave (C, L)) pairs; returns
    ({uid: text}, rtf) — the decode.py main loop with RTF reporting
    (cat/ctc/decode.py:96-113) without the mp.Queue plumbing."""
    dec = make_me2e_decoder(model, params, batch_stats, mode,
                            beam_width, future)
    hyps = {}
    audio_s = 0.0
    t0 = time.time()
    order = sorted(range(len(utterances)),
                   key=lambda i: utterances[i][1].shape[-1])
    for s in range(0, len(order), batch_size):
        idxs = order[s:s + batch_size]
        C = utterances[idxs[0]][1].shape[0]
        L = max(utterances[i][1].shape[-1] for i in idxs)
        wave = np.zeros((len(idxs), C, L), np.float32)
        lens = np.zeros((len(idxs),), np.int32)
        for j, i in enumerate(idxs):
            w = utterances[i][1]
            wave[j, :, : w.shape[-1]] = w
            lens[j] = w.shape[-1]
            audio_s += w.shape[-1] / 16000.0
        res = dec(wave, lens)
        for j, i in enumerate(idxs):
            hyps[utterances[i][0]] = tokenizer.decode(res[j][0][1])
    rtf = (time.time() - t0) / max(audio_s, 1e-6)
    return hyps, rtf
