"""ME2E CTC with the kaldi-compatible feature frontend.

Counterpart of /root/reference/cat/ctc/train_me2e_kaldi.py:105-418:
same STFT-domain beamforming + encoder + CTC as train_me2e, but the
framing matches torchaudio's kaldi compliance fbank (per-frame
DC-offset removal + 0.97 pre-emphasis before the povey window,
dither=0 — cat/front/kaldifbank.py:192-225), and a `noSE` mode
replaces the beamformer with the reference-channel selector
(cat/front/multi2mono.py ChannelSelector).

Everything else (init_state / make_train_step / make_eval_step, the
raw-wave batch layout, the NaN-guard) is shared with train_me2e: this
module only changes how the frontend is built from config, matching
the reference's decision to ship the variant as a separate trainer bin
while the math downstream of the features is identical.
"""
from __future__ import annotations

from cat_tpu.ctc.train_me2e import (  # noqa: F401  (re-exported API)
    Me2eModel,
    init_state,
    make_eval_step,
    make_train_step,
)
from cat_tpu.front.beamformer import BeamformerNet

from cat_tpu import models


def build_model(cfg: dict, num_classes: int) -> Me2eModel:
    f_kw = dict(cfg.get("frontend", {}).get("kwargs", {}))
    f_kw.setdefault("kaldi_framing", True)
    # reference spelling: `noSE: true` in the trainer kwargs
    if "noSE" in f_kw:
        f_kw["no_enhance"] = bool(f_kw.pop("noSE"))
    frontend = BeamformerNet(**f_kw)
    enc_cfg = cfg["encoder"]
    e_kw = dict(enc_cfg.get("kwargs", {}))
    e_kw["num_classes"] = num_classes
    encoder = models.get_encoder(enc_cfg["type"])(**e_kw)
    return Me2eModel(frontend=frontend, encoder=encoder)
