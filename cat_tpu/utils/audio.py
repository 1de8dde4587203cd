"""WAV audio IO (stdlib only — no soundfile/torchaudio dependency)."""
from __future__ import annotations

import wave

import numpy as np


def read_wav(path, mono=True):
    """Read 16-bit PCM WAV → (samples f32 in [-1,1], sample_rate).

    mono=True downmixes multichannel; mono=False returns (L, C) for
    multichannel files (ME2E array recordings, reference
    cat/ctc/train_me2e.py raw-wave input) and (L,) for mono ones."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch)
        if mono:
            data = data.mean(axis=1)
    return data, sr


def write_wav(path, samples, sample_rate=16000):
    """Write 16-bit PCM WAV. samples: (L,) mono or (L, C) multichannel."""
    samples = np.clip(np.asarray(samples), -1.0, 1.0)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    pcm = (samples * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(pcm).tobytes())
