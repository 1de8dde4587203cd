"""Synthesize the toy two-word dataset (yesno equivalent, no download).

Words: 'yes' = 440 Hz tone, 'no' = 880 Hz tone, 0.2 s each with 0.1 s
silence gaps; 8 kHz mono WAV.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                ".."))

from cat_tpu.utils.audio import write_wav

SR = 8000
TONES = {"yes": 440.0, "no": 880.0}


def make_utt(rng, words):
    chunks = [np.zeros(int(SR * 0.05), np.float32)]
    for w in words:
        t = np.arange(int(SR * 0.2)) / SR
        tone = 0.5 * np.sin(2 * np.pi * TONES[w] * t).astype(np.float32)
        tone *= np.hanning(len(tone)).astype(np.float32)
        chunks.append(tone + rng.standard_normal(len(tone)).astype(
            np.float32) * 0.01)
        chunks.append(np.zeros(int(SR * 0.1), np.float32))
    return np.concatenate(chunks)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--num-train", type=int, default=48)
    p.add_argument("--num-dev", type=int, default=12)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    for split, n in (("train", args.num_train), ("dev", args.num_dev)):
        d = os.path.join(args.out_dir, split)
        wav_d = os.path.join(d, "wav")
        os.makedirs(wav_d, exist_ok=True)
        scp, text = [], []
        for i in range(n):
            words = list(rng.choice(["yes", "no"],
                                    size=int(rng.integers(1, 5))))
            uid = f"{split}_{i:03d}"
            path = os.path.join(wav_d, uid + ".wav")
            write_wav(path, make_utt(rng, words), SR)
            scp.append(f"{uid} {os.path.abspath(path)}")
            text.append(f"{uid} {' '.join(words)}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
    print(f"wrote {args.num_train}+{args.num_dev} utts to {args.out_dir}")


if __name__ == "__main__":
    main()
