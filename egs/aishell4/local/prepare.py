"""AISHELL-4 (8-channel meeting corpus) → manifest dirs with segments.

Role of the reference's egs/aishell4/local/ori_data_prep.py +
data_multi.sh: each room recording is one multichannel wav plus a
TextGrid annotation (one interval tier per speaker); speech segments
are cut from the array recording, keeping a maximal set of
non-overlapping intervals (greedy by end time — the classic activity-
selection solution the reference gets from intervaltree).

Emits wav.scp (recording id → multichannel wav), segments
(uid rec start end) and text. Raw-wave ME2E packing then goes through
the shared CLI with --channels:

    python local/prepare.py /data/aishell4 data
    python -m cat_tpu.utils.data_prep data/train data/pkl-train \
        --tokenizer exp/x/tokenizer.tknz --channels 8
"""
import argparse
import glob
import os
import re


def parse_textgrid(path):
    """Minimal TextGrid interval parser → [(xmin, xmax, text)] over
    all tiers (speakers)."""
    ivs = []
    with open(path, errors="replace") as f:
        content = f.read()
    # both long and short TextGrid forms mark intervals with
    # xmin/xmax/text triples
    for m in re.finditer(
            r"xmin\s*=\s*([\d.]+)\s*\n\s*xmax\s*=\s*([\d.]+)\s*\n\s*"
            r"text\s*=\s*\"([^\"]*)\"", content):
        lo, hi, t = float(m.group(1)), float(m.group(2)), m.group(3)
        t = t.strip().replace(" ", "")
        if t and not t.startswith("<"):
            ivs.append((lo, hi, t))
    return ivs


def select_nonoverlapping(ivs):
    """Maximal non-overlapping subset: greedy by earliest end."""
    out, last_end = [], -1.0
    for lo, hi, t in sorted(ivs, key=lambda x: x[1]):
        if lo >= last_end:
            out.append((lo, hi, t))
            last_end = hi
    return out


def prepare(src, out_root, subsets=("train", "test"),
            min_dur=0.3, max_dur=30.0):
    for sub in subsets:
        # layouts in the wild: <root>/<sub>/wav/*.wav + TextGrid/, or
        # train_L/train_M/train_S merged into "train"
        sub_dirs = sorted(
            p for p in glob.glob(os.path.join(src, sub + "*"))
            if os.path.isdir(p))
        if not sub_dirs:
            continue
        d = os.path.join(out_root, sub)
        os.makedirs(d, exist_ok=True)
        scp, seg, text = [], [], []
        for sd in sub_dirs:
            for wav in sorted(
                    glob.glob(os.path.join(sd, "wav", "*.wav"))
                    + glob.glob(os.path.join(sd, "*.wav"))):
                rec = os.path.splitext(os.path.basename(wav))[0]
                tg = None
                for cand in (os.path.join(sd, "TextGrid",
                                          rec + ".TextGrid"),
                             os.path.join(sd, rec + ".TextGrid")):
                    if os.path.exists(cand):
                        tg = cand
                        break
                if tg is None:
                    continue
                scp.append(f"{rec} {os.path.abspath(wav)}")
                sel = select_nonoverlapping(parse_textgrid(tg))
                for i, (lo, hi, t) in enumerate(sel):
                    if not (min_dur <= hi - lo <= max_dur):
                        continue
                    uid = f"{rec}-{i:04d}"
                    seg.append(f"{uid} {rec} {lo:.2f} {hi:.2f}")
                    text.append(f"{uid} {t}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "segments"), "w") as f:
            f.write("\n".join(seg) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
        print(f"{d}: {len(scp)} recordings, {len(seg)} segments")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("--subsets", nargs="+", default=["train", "test"])
    a = p.parse_args()
    prepare(a.src, a.out, a.subsets)
