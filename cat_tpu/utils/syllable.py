"""Char → syllable converter table builder.

Counterpart of /root/reference/cat/utils/tool/prep_syllable_converter.py
(which uses pypinyin). Dependency-free: takes a char→syllable mapping
file (one "char syllable" pair per line, e.g. derived from a pinyin
dictionary) and a tokenizer vocabulary, and produces the integer
converter table consumed by SyllableEmbedding / SyllableEnhancedLSTM
(cat_tpu/models/layers.py).
"""
from __future__ import annotations

import pickle


def build_converter(vocab_tokens, char2syl, unk_syllable="<unk_syl>"):
    """vocab_tokens: list of tokens indexed by id; char2syl: dict or
    path to a "char syllable" file. Returns (converter list[int],
    syllable list[str])."""
    if isinstance(char2syl, str):
        mapping = {}
        with open(char2syl, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and parts[0] not in mapping:
                    mapping[parts[0]] = parts[1]
        char2syl = mapping
    syllables = [unk_syllable]
    syl2id = {unk_syllable: 0}
    converter = []
    for tok in vocab_tokens:
        syl = char2syl.get(tok, unk_syllable)
        if syl not in syl2id:
            syl2id[syl] = len(syllables)
            syllables.append(syl)
        converter.append(syl2id[syl])
    return converter, syllables


def save_converter(path, converter, syllables):
    """Pickle format compatible with the reference's syllable_data
    ({"converter", "num_syllables"}, layer.py:963-968)."""
    import numpy as np

    with open(path, "wb") as f:
        pickle.dump({"converter": np.asarray(converter, np.int64),
                     "num_syllables": len(syllables),
                     "syllables": syllables}, f)


def load_converter(path):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return [int(x) for x in d["converter"]], d.get(
        "syllables", d["num_syllables"])
