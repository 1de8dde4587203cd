"""Runtime utilities: config, schedulers, data, tokenizers, checkpoints,
metrics, train-loop manager."""
