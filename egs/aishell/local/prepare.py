"""AISHELL-1 corpus → manifest dirs (wav.scp + text) per split.

Role of the reference's egs/aishell/local/data.sh + extract_fbank.py:
walk data_aishell/wav/{train,dev,test}/<spk>/*.wav, transcripts from
data_aishell/transcript/aishell_transcript_v0.8.txt (space-segmented
words; spaces are removed for char-level CER scoring, matching the
reference's rm-space post-pass). Feature extraction is the shared CLI:

    python local/prepare.py /data/aishell data
    python -m cat_tpu.utils.data_prep data/train data/pkl-train \
        --tokenizer exp/x/tokenizer.tknz --speed-perturb 0.9 1.1
"""
import argparse
import glob
import os


def prepare(src, out_root, subsets=("train", "dev", "test"),
            keep_spaces=False):
    trans = {}
    tfile = glob.glob(os.path.join(src, "transcript", "*.txt"))
    for tf in tfile:
        with open(tf) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if len(parts) == 2:
                    t = parts[1]
                    trans[parts[0]] = t if keep_spaces else \
                        t.replace(" ", "")
    for sub in subsets:
        d = os.path.join(out_root, sub)
        os.makedirs(d, exist_ok=True)
        scp, text = [], []
        for wav in sorted(glob.glob(os.path.join(
                src, "wav", sub, "*", "*.wav"))):
            uid = os.path.splitext(os.path.basename(wav))[0]
            if uid in trans:
                scp.append(f"{uid} {os.path.abspath(wav)}")
                text.append(f"{uid} {trans[uid]}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
        print(f"{d}: {len(scp)} utts")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src", help="data_aishell root (wav/ + transcript/)")
    p.add_argument("out", help="output manifest root")
    p.add_argument("--subsets", nargs="+",
                   default=["train", "dev", "test"])
    p.add_argument("--keep-spaces", action="store_true")
    a = p.parse_args()
    prepare(a.src, a.out, a.subsets, a.keep_spaces)
