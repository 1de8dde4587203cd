"""cat_tpu — a TPU-native CRF-based ASR framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of thu-spmi/CAT
(see SURVEY.md): CTC / CTC-CRF / RNN-T acoustic model training, neural &
n-gram language models, beam-search and WFST decoding, JSON-configured
experiment pipeline — designed for TPU from the start (SPMD over device
meshes, scan-based log-semiring loss kernels, static-shape decoding).
"""

__version__ = "0.1.0"
