"""Training: losses, state, sharding, stage1/stage2 loops."""
