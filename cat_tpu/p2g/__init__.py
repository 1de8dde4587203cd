"""LLM-P2G: seq2seq phoneme-to-grapheme with noisy-phoneme training.

Counterpart of /root/reference/egs/llm-p2g (INTERSPEECH'25 "LLM-based
phoneme-to-grapheme"): mT5 fine-tuning with DANP (data augmentation via
noisy phonemes) and TKM/SKM (top-K / sampling-K marginalized) training.
Rebuilt TPU-native: a flax encoder-decoder transformer + jit-batched
marginalized losses instead of a patched HF mT5 forward
(egs/llm-p2g/local/forward_MT5ForConditionalGeneration.py).
"""
from cat_tpu.p2g.train import (P2GSeq2Seq, build_model, danp_expand,
                               greedy_generate, make_train_step,
                               marginalized_rescore, seq_logp, tkm_loss)
