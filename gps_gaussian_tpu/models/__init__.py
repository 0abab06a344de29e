"""Neural networks (flax.linen, NHWC, bf16-capable)."""
