"""RNN-Transducer task."""
