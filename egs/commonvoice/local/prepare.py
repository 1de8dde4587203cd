"""Mozilla CommonVoice → manifest dirs (wav.scp + text) per split.

Role of the reference's egs/commonvoice/local/data.sh: read
<root>/{train,dev,test}.tsv (column 2 = clip filename, column 3 =
sentence), audio under <root>/clips/. The reference decodes mp3 via
torchaudio; this environment has no mp3 decoder, so clips must be
wav-converted in place (same stems, .wav extension) — the driver
resolves either extension and skips clips without a wav.

    python local/prepare.py /data/cv-corpus/de data
"""
import argparse
import csv
import os
import sys


def prepare(src, out_root, subsets=("train", "dev", "test")):
    clips = os.path.join(src, "clips")
    for sub in subsets:
        tsv = os.path.join(src, f"{sub}.tsv")
        if not os.path.exists(tsv):
            print(f"skip {sub}: no {tsv}", file=sys.stderr)
            continue
        d = os.path.join(out_root, sub)
        os.makedirs(d, exist_ok=True)
        scp, text = [], []
        with open(tsv, newline="") as f:
            reader = csv.DictReader(f, delimiter="\t")
            for i, row in enumerate(reader):
                path = row.get("path", "")
                sent = (row.get("sentence") or "").strip()
                if not path or not sent:
                    continue
                stem = os.path.splitext(path)[0]
                wav = os.path.join(clips, stem + ".wav")
                if not os.path.exists(wav):
                    continue
                uid = stem.replace("/", "_")
                scp.append(f"{uid} {os.path.abspath(wav)}")
                text.append(f"{uid} {sent}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(text) + "\n")
        print(f"{d}: {len(scp)} utts")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src", help="language root (tsv files + clips/)")
    p.add_argument("out")
    p.add_argument("--subsets", nargs="+",
                   default=["train", "dev", "test"])
    a = p.parse_args()
    prepare(a.src, a.out, a.subsets)
