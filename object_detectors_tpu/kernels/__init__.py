"""Pallas TPU kernels for the hot post-processing ops, with pure-XLA
fallbacks (used automatically off-TPU)."""
