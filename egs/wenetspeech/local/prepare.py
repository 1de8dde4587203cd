"""WenetSpeech (10k-hour) → manifest dirs + streaming shards.

Role of the reference's egs/wenetspeech/local/extract_meta.py +
wenetspeech_data_prep.sh + prep_wds.py: parse WenetSpeech.json
({"audios": [{"aid", "path", "segments": [{"sid", "begin_time",
"end_time", "text", "subsets"}]}]}), split long recordings into
segment manifests per subset, then write npz shards for streaming
training (the corpus does not fit packed in one file). The reference
decodes opus; here recordings must be wav-converted with the same
stems (no opus decoder in this environment).

    python local/prepare.py /data/WenetSpeech/WenetSpeech.json data \
        --subsets M DEV TEST_NET
    python -m cat_tpu.utils.data_prep data/M data/shards-M \
        --tokenizer exp/x/tokenizer.tknz --format shards

Training then streams via hyper train.option.sharded_data (CTC, RNN-T
and — with the den LM estimated by the label pre-pass or an offline
.arpa — CTC-CRF)."""
import argparse
import json
import os


def prepare(input_json, out_root, subsets=("L", "DEV", "TEST_NET",
                                           "TEST_MEETING")):
    root = os.path.dirname(os.path.abspath(input_json))
    with open(input_json) as f:
        meta = json.load(f)
    outs = {s: {"scp": [], "seg": [], "text": []} for s in subsets}
    for audio in meta.get("audios", []):
        path = audio["path"]
        stem = os.path.splitext(path)[0]
        wav = os.path.join(root, stem + ".wav")
        aid = audio["aid"]
        used = set()
        for seg in audio.get("segments", []):
            subs = seg.get("subsets", [])
            text = (seg.get("text") or "").strip().replace(" ", "")
            if not text:
                continue
            for s in subsets:
                if s in subs:
                    o = outs[s]
                    o["seg"].append(
                        f"{seg['sid']} {aid} {seg['begin_time']:.2f} "
                        f"{seg['end_time']:.2f}")
                    o["text"].append(f"{seg['sid']} {text}")
                    used.add(s)
        for s in used:
            outs[s]["scp"].append(f"{aid} {wav}")
    for s, o in outs.items():
        if not o["seg"]:
            continue
        d = os.path.join(out_root, s)
        os.makedirs(d, exist_ok=True)
        for name, key in (("wav.scp", "scp"), ("segments", "seg"),
                          ("text", "text")):
            with open(os.path.join(d, name), "w") as f:
                f.write("\n".join(o[key]) + "\n")
        print(f"{d}: {len(o['scp'])} recordings, {len(o['seg'])} segments")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("input_json")
    p.add_argument("out")
    p.add_argument("--subsets", nargs="+",
                   default=["L", "DEV", "TEST_NET", "TEST_MEETING"])
    a = p.parse_args()
    prepare(a.input_json, a.out, a.subsets)
