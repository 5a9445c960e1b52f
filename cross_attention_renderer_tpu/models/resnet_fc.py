"""Fully-connected ResNet light-field decoder.

From-scratch Flax version of the reference's DVR-style ``ResnetFC``
(``resnet_block_fc.py:65-168``): per-block latent injection
``x = x + lin_z[i](z)`` before each residual block, zero-initialized final
block layer, kaiming-normal fan-in init elsewhere.

The reference's ``combine_layer``/``combine_interleaved`` multiview-average
machinery is dead code at the instantiated config (combine_layer=1000 >
n_blocks=3, and the import it relies on is broken — SURVEY.md §2.1), so it
is deliberately not carried over.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = Any

_kaiming = nn.initializers.variance_scaling(2.0, 'fan_in', 'normal')


class ResnetBlockFC(nn.Module):
    """Residual FC block: x + fc_1(relu(fc_0(relu(x)))).

    Ref: ``ResnetBlockFC`` (resnet_block_fc.py:10-62); fc_1 zero-init
    (resnet_block_fc.py:39) so each block starts as identity.
    """
    size_h: int
    size_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        net = nn.Dense(self.size_h, kernel_init=_kaiming, dtype=self.dtype,
                       name='fc_0')(nn.relu(x))
        dx = nn.Dense(self.size_out, kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name='fc_1')(nn.relu(net))
        if x.shape[-1] != self.size_out:
            x = nn.Dense(self.size_out, use_bias=False, kernel_init=_kaiming,
                         dtype=self.dtype, name='shortcut')(x)
        return x + dx


class ResnetFC(nn.Module):
    """Latent-conditioned FC ResNet: rgb = lin_out(relu(blocks(lin_in(x))))
    with z injected additively before every block.

    Ref: ``ResnetFC`` (resnet_block_fc.py:65-168). Instantiated by the
    renderer as phi = ResnetFC(d_in=n_view*9, d_latent=latent*n_view,
    n_blocks=3, d_hidden=128, d_out=3) (models.py:144-145).

    Input layout: ``zx = concat([z, x], -1)`` like the reference
    (resnet_block_fc.py:142-144).
    """
    d_in: int
    d_latent: int
    d_out: int = 3
    n_blocks: int = 3
    d_hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, zx: Array) -> Array:
        z = zx[..., :self.d_latent]
        x = zx[..., self.d_latent:]
        x = nn.Dense(self.d_hidden, kernel_init=_kaiming, dtype=self.dtype,
                     name='lin_in')(x)
        for i in range(self.n_blocks):
            tz = nn.Dense(self.d_hidden, kernel_init=_kaiming,
                          dtype=self.dtype, name=f'lin_z{i}')(z)
            x = ResnetBlockFC(self.d_hidden, self.d_hidden, dtype=self.dtype,
                              name=f'block{i}')(x + tz)
        return nn.Dense(self.d_out, kernel_init=_kaiming, dtype=self.dtype,
                        name='lin_out')(nn.relu(x))
