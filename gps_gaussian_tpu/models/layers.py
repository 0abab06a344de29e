"""Shared conv building blocks (flax.linen, NHWC).

Covers the reference's ResidualBlock / GroupNorm idiom
(core/extractor.py:6-60).  Convolutions use torch-style kaiming-uniform
initialisation so the reference's training recipes (lr 2e-4, AdamW) carry
over unchanged.  GroupNorm statistics are always computed in f32 even under
a bf16 compute policy.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.nn import initializers


# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
conv_kernel_init = initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def conv_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / np.sqrt(fan_in)
    from jax import random
    return random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """Conv2d with torch-default init (kernel + bias)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: int = 1
    padding: Union[str, int] = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        in_ch = x.shape[-1]
        fan_in = in_ch * int(np.prod(ks))
        bias_init = (lambda key, shape, dtype=jnp.float32:
                     conv_bias_init(key, shape, dtype, fan_in))
        return nn.Conv(
            features=self.features, kernel_size=ks,
            strides=(self.strides, self.strides), padding=pad,
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=conv_kernel_init, bias_init=bias_init)(x)


class GroupNorm32(nn.Module):
    """GroupNorm computed in f32, output cast back to the input dtype."""

    num_groups: int

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(orig)


def make_norm(norm_fn: str, planes: int) -> Callable:
    """'group' | 'none' (batch/instance exist in the reference but are never
    selected — GroupNorm is the default everywhere, SURVEY.md §2.1 #5)."""
    if norm_fn == "group":
        return GroupNorm32(num_groups=planes // 8)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unsupported norm_fn: {norm_fn}")


class ResidualBlock(nn.Module):
    """conv3x3(stride)+GN+relu -> conv3x3+GN+relu, 1x1 skip when needed.

    Math of reference core/extractor.py:6-60.
    """

    planes: int
    stride: int = 1
    norm_fn: str = "group"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_planes = x.shape[-1]
        y = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                 name="conv1")(x)
        y = make_norm(self.norm_fn, self.planes)(y)
        y = nn.relu(y)
        y = Conv(self.planes, 3, 1, 1, dtype=self.dtype, name="conv2")(y)
        y = make_norm(self.norm_fn, self.planes)(y)
        y = nn.relu(y)

        if self.stride != 1 or in_planes != self.planes:
            x = Conv(self.planes, 1, self.stride, 0, dtype=self.dtype,
                     name="downsample")(x)
            x = make_norm(self.norm_fn, self.planes)(x)
        return nn.relu(x + y)
