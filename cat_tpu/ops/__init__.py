"""Compute ops: log-semiring losses (CTC / CTC-CRF / RNN-T), frontend, specaug.

TPU-native replacements for the reference's native kernels
(/root/reference/src/ctc_crf — gpu_ctc, gpu_den; warp_rnnt): pure
JAX scan formulations with custom VJPs, plus Pallas variants for the hot
paths.
"""

from cat_tpu.ops.semiring import LOG_EPS, logaddexp3, masked_logsumexp
from cat_tpu.ops.ctc import ctc_loss
