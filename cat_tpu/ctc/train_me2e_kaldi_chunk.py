"""Chunk-based (CUSIDE) ME2E CTC with the kaldi feature frontend.

Counterpart of /root/reference/cat/ctc/train_me2e_kaldi_chunk.py:
train_me2e_chunk's chunked beamform-then-encode trainer with the
kaldi-compliance framing (DC removal + pre-emphasis, dither=0) and the
optional `noSE` channel-selector bypass — see train_me2e_kaldi.py.
"""
from __future__ import annotations

from cat_tpu.ctc.train_me2e_chunk import (  # noqa: F401
    ChunkMe2eModel,
    SimuNet,
    init_state,
    make_eval_step,
    make_train_step,
)
from cat_tpu.ctc.train_me2e_chunk import build_model as _build_chunk
from cat_tpu.front.beamformer import BeamformerNet

from cat_tpu import models


def build_model(cfg: dict, num_classes: int) -> ChunkMe2eModel:
    f_kw = dict(cfg.get("frontend", {}).get("kwargs", {}))
    f_kw.setdefault("kaldi_framing", True)
    if "noSE" in f_kw:
        f_kw["no_enhance"] = bool(f_kw.pop("noSE"))
    cfg = dict(cfg)
    cfg["frontend"] = {"kwargs": f_kw}
    return _build_chunk(cfg, num_classes)
