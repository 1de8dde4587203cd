"""From-scratch WFST subsystem (host-side graph building, numpy).

Replaces the reference's OpenFST/Kaldi/KenLM native dependencies
(/root/reference/src/ctc_crf/gpu_den/fst_read.cc, utils/tool/prep_den_lm.sh,
utils/tool/build_decoding_graph.sh, utils/pipeline/ngram.sh) with a pure
Python/numpy implementation: graphs are built on the host once per
experiment, then flattened to dense arc tables that live on device for the
Pallas/scan forward-backward and decoding kernels.

Weight convention: natural-log probabilities (added along a path, logsumexp
across paths). OpenFST tropical weights are the negation of this.
"""

from cat_tpu.fst.fst import Fst, compose, rm_epsilon, connect
from cat_tpu.fst.ngram import NGramLM, train_ngram, read_arpa, write_arpa
from cat_tpu.fst.graph import (
    ctc_topo,
    arpa_to_fst,
    lexicon_fst,
    build_den_fst,
    DenGraph,
)
