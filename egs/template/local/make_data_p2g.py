"""Synthesize the toy LLM-P2G dataset for exp/p2g-danp: deterministic
phoneme→word pairs (`src` + `text`) plus noisy 3-best candidate sets
(`src_nbest`) standing in for a frozen S2P model's beam n-best
(reference egs/llm-p2g DANP/TKM data prep)."""
import argparse
import os

import numpy as np

WORDS = {"alpha": "a l f a", "bravo": "b r a v o",
         "charlie": "c a r l i", "delta": "d e l t a",
         "echo": "e k o"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--num-train", type=int, default=400)
    p.add_argument("--num-dev", type=int, default=30)
    args = p.parse_args()
    rng = np.random.default_rng(2)
    phones = sorted({ph for s in WORDS.values() for ph in s.split()})
    for split, n in (("train", args.num_train), ("dev", args.num_dev)):
        d = os.path.join(args.out_dir, split)
        os.makedirs(d, exist_ok=True)
        src, text, nbest = [], [], []
        for i in range(n):
            words = list(rng.choice(sorted(WORDS),
                                    size=int(rng.integers(1, 4))))
            uid = f"{split}_{i:03d}"
            ph = " ".join(WORDS[w] for w in words)
            src.append(f"{uid} {ph}")
            text.append(f"{uid} {' '.join(words)}")
            nbest.append(f"{uid} 0.0 {ph}")
            for k in range(2):
                toks = ph.split()
                j = int(rng.integers(0, len(toks)))
                toks[j] = phones[int(rng.integers(0, len(phones)))]
                nbest.append(f"{uid} -{k + 1}.0 {' '.join(toks)}")
        with open(os.path.join(d, "src"), "w") as f:
            f.write("\n".join(src) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
        with open(os.path.join(d, "src_nbest"), "w") as f:
            f.write("\n".join(nbest) + "\n")
    print(f"wrote p2g data to {args.out_dir}")


if __name__ == "__main__":
    main()
