"""Synthesize the toy 2-channel array dataset for exp/asr-me2e.

Channel 1 is channel 0 delayed by two samples plus extra noise — a
minimal far-field array so the MVDR frontend has something to do
(reference egs/aishell4 role, 8-ch real arrays)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                ".."))

import make_data
from cat_tpu.utils.audio import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--num-train", type=int, default=96)
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
                                    size=int(rng.integers(1, 4))))
            mono = make_data.make_utt(rng, words)
            ch1 = np.roll(mono, 2) + rng.standard_normal(
                len(mono)).astype(np.float32) * 0.02
            wave = np.stack([mono, ch1], axis=1)
            uid = f"{split}_{i:03d}"
            path = os.path.join(wav_d, uid + ".wav")
            write_wav(path, wave, make_data.SR)
            scp.append(f"{uid} {os.path.abspath(path)}")
            text.append(f"{uid} {' '.join(words)}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
    print(f"wrote 2-ch data to {args.out_dir}")


if __name__ == "__main__":
    main()
