"""ResNetV2 hybrid stem for the DPT-hybrid encoder (R50+ViT-B/16).

From-scratch Flax implementation of the convolutional trunk the reference
gets from timm's ``vit_base_r50_s16_384`` (``vit_models.py:184-192``:
``_resnetv2((3, 4, 9))``): weight-standardized convs with TF-SAME padding,
GroupNorm(32)+ReLU bottlenecks, stage widths 256/512/1024 at strides
/4, /8, /16. timm's ViT-hybrid helper builds ResNetV2 with
``preact=False`` (matching google's original R50+ViT trunk): norm AFTER
each conv, the projection shortcut is conv+norm, and the block activation
fires after the residual add. The two early stages double as the DPT's
high-res feature taps (``midas/vit.py:410-416``), so
:meth:`ResNetV2Stem.__call__` returns all three stage outputs explicitly —
no forward hooks.

Layout: NHWC (channel-last), the native TPU conv layout. The parameter tree
is organized to permit a mechanical mapping from timm checkpoints
(stem / stage{i} / block{j} / conv{k}+norm{k}).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = Any


class StdConv(nn.Module):
    """Weight-standardized conv, TF-SAME padding.

    Matches timm ``StdConv2dSame``: kernel standardized per output channel
    over (kh, kw, in) with biased variance, no bias. timm's hybrid helper
    pins ``eps=1e-8`` on every trunk conv, while the stem conv the
    reference swaps in at ``models.py:93`` is a default-constructed
    ``StdConv2dSame`` (eps 1e-6) — hence the field.
    """
    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = False
    eps: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features), jnp.float32)
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / jnp.sqrt(var + self.eps)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def max_pool_same(x: Array, window: tuple[int, int],
                  strides: tuple[int, int]) -> Array:
    """Max pool with TF-SAME padding using a finite pad value.

    ``nn.max_pool(padding='SAME')`` pads with -inf, and the select-and-
    scatter backward of -inf-padded windows produces NaN gradients on the
    TPU backend (isolated in round-1 debugging: plain conv + GN + that pool
    alone NaNs; swapping only the pool fixes it). Padding with a large
    finite value keeps the same forward semantics for real activations.
    """
    H, W = x.shape[-3], x.shape[-2]
    pads = []
    for size, k, s in ((H, window[0], strides[0]), (W, window[1],
                                                    strides[1])):
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        pads.append((total // 2, total - total // 2))
    x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)),
                constant_values=-1e30)
    return nn.max_pool(x, window, strides=strides, padding='VALID')


class GroupNormRelu(nn.Module):
    """GroupNorm(32), optionally + ReLU (timm ``GroupNormAct``)."""
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_fast_variance=False,
                         dtype=self.dtype)(x)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    """Non-preact bottleneck (timm ResNetV2 with ``preact=False``, the
    variant its ViT-hybrid helper builds): conv->norm->relu twice,
    conv3->norm3, ReLU after the residual add; projection shortcut is
    conv + norm (no act)."""
    mid: int
    out: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        needs_proj = (x.shape[-1] != self.out) or self.stride != 1
        if needs_proj:
            shortcut = StdConv(self.out, (1, 1), (self.stride, self.stride),
                               dtype=self.dtype, name='downsample_conv')(x)
            shortcut = GroupNormRelu(act=False, dtype=self.dtype,
                                     name='downsample_norm')(shortcut)
        else:
            shortcut = x
        y = StdConv(self.mid, (1, 1), dtype=self.dtype, name='conv1')(x)
        y = GroupNormRelu(dtype=self.dtype, name='norm1')(y)
        y = StdConv(self.mid, (3, 3), (self.stride, self.stride),
                    dtype=self.dtype, name='conv2')(y)
        y = GroupNormRelu(dtype=self.dtype, name='norm2')(y)
        y = StdConv(self.out, (1, 1), dtype=self.dtype, name='conv3')(y)
        y = GroupNormRelu(act=False, dtype=self.dtype, name='norm3')(y)
        return nn.relu(y + shortcut)


class ResNetV2Stem(nn.Module):
    """R50 trunk with (3, 4, 9) blocks; returns the three stage outputs.

    For a 256x256 input: stage0 (64x64, 256ch), stage1 (32x32, 512ch),
    stage2 (16x16, 1024ch).
    """
    layers: tuple[int, int, int] = (3, 4, 9)
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array, Array]:
        # The reference swaps in a default-eps StdConv2dSame for the stem
        # conv (models.py:93); trunk convs keep the helper's eps=1e-8.
        x = StdConv(self.width, (7, 7), (2, 2), eps=1e-6, dtype=self.dtype,
                    name='stem_conv')(x)
        x = GroupNormRelu(dtype=self.dtype, name='stem_norm')(x)
        x = max_pool_same(x, (3, 3), (2, 2))

        outs = []
        in_factor = 4
        for stage_idx, n_blocks in enumerate(self.layers):
            out_ch = self.width * in_factor * (2 ** stage_idx)
            mid_ch = out_ch // 4
            for block_idx in range(n_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                x = Bottleneck(
                    mid=mid_ch, out=out_ch, stride=stride, dtype=self.dtype,
                    name=f'stage{stage_idx}_block{block_idx}')(x)
            outs.append(x)
        return tuple(outs)
