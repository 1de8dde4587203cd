"""Synthesize the toy JSA-SPG dataset for exp/asr-jsa: yesno audio +
phoneme lexicon (yes→J E S, no→N O) + full phoneme supervision
(text_phone; the lexicon tokenizer maps word text to phones)."""
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
    p.add_argument("--num-train", type=int, default=48)
    p.add_argument("--num-dev", type=int, default=16)
    args = p.parse_args()
    rng = np.random.default_rng(1)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "lexicon.txt"), "w") as f:
        f.write("yes J E S\nno N O\n")
    for split, n in (("train", args.num_train), ("dev", args.num_dev)):
        d = os.path.join(args.out_dir, split)
        wav_d = os.path.join(d, "wav")
        os.makedirs(wav_d, exist_ok=True)
        scp, text = [], []
        for i in range(n):
            words = list(rng.choice(["yes", "no"],
                                    size=int(rng.integers(1, 4))))
            uid = f"{split}_{i:03d}"
            path = os.path.join(wav_d, uid + ".wav")
            write_wav(path, make_data.make_utt(rng, words), make_data.SR)
            scp.append(f"{uid} {os.path.abspath(path)}")
            text.append(f"{uid} {' '.join(words)}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
        with open(os.path.join(d, "text_phone"), "w") as f:
            f.write("\n".join(text) + "\n")
    print(f"wrote jsa data to {args.out_dir}")


if __name__ == "__main__":
    main()
