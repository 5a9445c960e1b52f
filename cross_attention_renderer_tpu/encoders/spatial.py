"""pixelNeRF-style multi-scale ResNet34 encoder (the reference's
``SpatialEncoder``, encoder.py:12-104, config: num_layers=4,
use_first_pool=False, norm_type='batch' -> we use GroupNorm, see below).

Returns the pyramid highest-stride first (the reference reverses its latents
list, encoder.py:101): [256@H/8, 128@H/4, 64@H/2, 64@H/2] — concatenated
latent width 512.

Design note: torchvision BatchNorm running statistics are a poor fit for the
functional JAX training step (mutable state threading for zero benefit at
batch 12); GroupNorm(32) is the standard drop-in with equivalent quality.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gn = lambda name: nn.GroupNorm(num_groups=32, use_fast_variance=False,
                                       dtype=self.dtype, name=name)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = nn.relu(gn('norm1')(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = gn('norm2')(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name='proj')(x)
            x = nn.GroupNorm(num_groups=32, use_fast_variance=False,
                             dtype=self.dtype, name='proj_norm')(x)
        return nn.relu(y + x)


class SpatialEncoder(nn.Module):
    """ResNet34 layers conv1..layer3, multi-scale taps, reversed order."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: Array) -> tuple[Array, ...]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name='conv1')(rgb)
        x = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 name='norm1')(x))
        taps = [x]                       # 64 @ H/2
        # use_first_pool=False (models.py:64): layer1 stays at H/2.
        for i in range(3):
            x = BasicBlock(64, dtype=self.dtype, name=f'layer1_b{i}')(x)
        taps.append(x)                   # 64 @ H/2
        for i in range(4):
            x = BasicBlock(128, stride=2 if i == 0 else 1, dtype=self.dtype,
                           name=f'layer2_b{i}')(x)
        taps.append(x)                   # 128 @ H/4
        for i in range(6):
            x = BasicBlock(256, stride=2 if i == 0 else 1, dtype=self.dtype,
                           name=f'layer3_b{i}')(x)
        taps.append(x)                   # 256 @ H/8
        return tuple(reversed(taps))
