"""Librispeech data prep: corpus tree → wav.scp + text per split.

Standard layout: LibriSpeech/<split>/<spk>/<chap>/<utt>.wav plus
<spk>-<chap>.trans.txt. NOTE: this environment has no FLAC decoder
(no ffmpeg/sox/soundfile); convert .flac to 16 kHz .wav beforehand, or
point the pipeline at pre-packed features (a dir with meta.npz).
"""
import argparse
import glob
import os


def prepare(corpus_split_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    scp, text = [], []
    trans = {}
    for tfile in glob.glob(os.path.join(corpus_split_dir, "*", "*",
                                        "*.trans.txt")):
        with open(tfile) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if len(parts) == 2:
                    trans[parts[0]] = parts[1].lower()
    for wav in sorted(glob.glob(os.path.join(corpus_split_dir, "*", "*",
                                             "*.wav"))):
        uid = os.path.splitext(os.path.basename(wav))[0]
        if uid in trans:
            scp.append(f"{uid} {os.path.abspath(wav)}")
            text.append(f"{uid} {trans[uid]}")
    with open(os.path.join(out_dir, "wav.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    with open(os.path.join(out_dir, "text"), "w") as f:
        f.write("\n".join(text) + "\n")
    print(f"{out_dir}: {len(scp)} utts")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("corpus_split_dir")
    p.add_argument("out_dir")
    a = p.parse_args()
    prepare(a.corpus_split_dir, a.out_dir)
