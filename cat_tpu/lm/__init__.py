"""Language model task: NN LM training, perplexity, n-best rescoring."""
