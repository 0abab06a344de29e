"""Compute primitives: sampling, correlation, pooling (pure XLA/jnp)."""
