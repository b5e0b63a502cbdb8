"""Training: optimizers/schedulers, train state, SPMD train step,
checkpointing, multiscale bucketing."""
