"""Small convolutional down-stack encoder (the reference's ``UNetEncoder``).

The reference class declares a full U-Net but its forward returns only the
four down-path feature maps (``encoder.py:178-206``, up-path commented out);
this implements exactly the live path: 64@H/2, 128@H/4, 256@H/8, 512@H/16
(concatenated latent width 960).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = Any


class UNetEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: Array) -> tuple[Array, ...]:
        """rgb: (B, H, W, 3) -> four maps at H/2..H/16."""
        down = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(32, (7, 7), padding=3, dtype=self.dtype,
                            name='down1')(rgb))
        x = down(x)
        outs = []
        for i, (ch, k) in enumerate([(64, 5), (128, 3), (256, 3), (512, 3)]):
            x = nn.relu(nn.Conv(ch, (k, k), padding=k // 2, dtype=self.dtype,
                                name=f'down{i + 2}')(x))
            outs.append(x)
            if i < 3:
                x = down(x)
        return tuple(outs)
