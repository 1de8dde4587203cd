"""WSJ corpus → manifest dirs (wav.scp + text) per split.

Role of the reference's egs/wsj/local/data_kaldi.sh (which defers to
kaldi's wsj prep over the LDC sphere files). This environment has no
sphere decoder, so the driver consumes the common wav-converted layout:
<root>/<split>/**/<uid>.wav plus .dot transcript files anywhere under
the split ("TRANSCRIPT (uid)" per line, the WSJ convention). Standard
normalization applied: uppercase, verbalized-punctuation markers and
non-word annotations stripped.

    python local/prepare.py /data/wsj_wav data \
        --splits train_si284 test_dev93 test_eval92
"""
import argparse
import glob
import os
import re


def norm_trans(t):
    t = t.upper()
    t = re.sub(r"\\", "", t)
    t = re.sub(r"\[[^\]]*\]", "", t)    # noise annotations [<door_slam>]
    t = re.sub(r"<[^>]*>", "", t)       # verbal punctuation tokens
    t = re.sub(r"\([^)]*\)", "", t)     # stray parens (not the uid)
    t = t.replace("~", "").replace("*", "")
    t = re.sub(r"`|\"", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    return t


def read_dots(split_dir):
    trans = {}
    for dot in glob.glob(os.path.join(split_dir, "**", "*.dot"),
                         recursive=True):
        with open(dot, errors="replace") as f:
            for line in f:
                m = re.match(r"(.*)\((\S+)\)\s*$", line.strip())
                if m:
                    trans[m.group(2).lower()] = norm_trans(m.group(1))
    return trans


def prepare(src, out_root, splits):
    for sub in splits:
        split_dir = os.path.join(src, sub)
        trans = read_dots(split_dir)
        d = os.path.join(out_root, sub)
        os.makedirs(d, exist_ok=True)
        scp, text = [], []
        for wav in sorted(glob.glob(os.path.join(split_dir, "**",
                                                 "*.wav"),
                                    recursive=True)):
            uid = os.path.splitext(os.path.basename(wav))[0].lower()
            if uid in trans and trans[uid]:
                scp.append(f"{uid} {os.path.abspath(wav)}")
                text.append(f"{uid} {trans[uid]}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
        print(f"{d}: {len(scp)} utts")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("--splits", nargs="+",
                   default=["train_si284", "test_dev93", "test_eval92"])
    a = p.parse_args()
    prepare(a.src, a.out, a.splits)
