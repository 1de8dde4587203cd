"""Multichannel end-to-end (ME2E) frontend: STFT, neural mask MVDR
beamforming, log-mel — jit-able replacements for
/root/reference/cat/front/{stft,log_mel,beamformer_net}.py."""

from cat_tpu.front.beamformer import (Stft, LogMel, MaskNet,
                                      BeamformerNet, mvdr_weights)
