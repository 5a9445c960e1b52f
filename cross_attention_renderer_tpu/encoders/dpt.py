"""DPT (dense prediction transformer) feature decoder + full hybrid encoder.

From-scratch Flax re-design of the reference's DPT stack
(``midas/dpt_depth.py`` + ``midas/blocks.py``), truncated exactly like the
reference to return the two highest-resolution fusion maps instead of a
monocular-depth head (``dpt_depth.py:89-94``):

  encoder(rgb, rel_pose) -> (path_2: (B*V, H/4, W/4, 256),
                             path_1: (B*V, H/2, W/2, 256))

Design differences from the reference (TPU-first, not a translation):
  * no forward hooks — the ResNet stages and ViT tap blocks return their
    activations explicitly;
  * channel-last NHWC everywhere;
  * the fusion upsample (bilinear x2, align_corners=True,
    ``midas/blocks.py:335-337``) is a pair of exact interpolation matmuls
    (MXU) rather than a gather-based resize;
  * all views are batched through the conv trunk at once and only the ViT
    blocks see the joint V*257-token sequence, mirroring
    ``midas/vit.py:185-199``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cross_attention_renderer_tpu.encoders.resnetv2 import ResNetV2Stem
from cross_attention_renderer_tpu.encoders.vit import MultiViewViT
from cross_attention_renderer_tpu.utils.image import upsample2x_align_corners

Array = Any


class ProjectReadout(nn.Module):
    """Fold the cls token into every spatial token.

    Ref: ``ProjectReadout`` (midas/vit.py:32-43), used because DPT is built
    with readout='project' (midas/dpt_depth.py:32).
    """
    width: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens_with_cls: Array) -> Array:
        cls, tokens = tokens_with_cls[:, :1], tokens_with_cls[:, 1:]
        cls = jnp.broadcast_to(cls, tokens.shape)
        x = jnp.concatenate([tokens, cls], axis=-1)
        x = nn.Dense(self.width, dtype=self.dtype, name='project')(x)
        return nn.gelu(x, approximate=False)


class ResidualConvUnit(nn.Module):
    """ReLU -> conv3x3 -> ReLU -> conv3x3, residual.

    Ref: ``ResidualConvUnit_custom`` (midas/blocks.py:231-288), bn=False.
    """
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(y)
        return y + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion: merge skip, refine, upsample x2, project.

    Ref: ``FeatureFusionBlock_custom`` (midas/blocks.py:291-341) with
    deconv=False, bn=False, expand=False, align_corners=True.
    """
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array | None = None) -> Array:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name='rcu1')(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name='rcu2')(x)
        x = upsample2x_align_corners(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name='out_conv')(x)


class DPTHybridEncoder(nn.Module):
    """R50 stem + multi-view ViT + DPT fusion, truncated at [path_2, path_1].

    Input rgb must already be ImageNet-normalized (the renderer does this,
    mirroring models.py:168-170).
    """
    features: int = 256
    vit_width: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    remat: bool = False
    resnet_layers: tuple[int, int, int] = (3, 4, 9)
    resnet_width: int = 64
    pretrain_grid: int = 14   # see MultiViewViT.pretrain_grid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: Array, rel_pose16: Array) -> tuple[Array, Array]:
        """rgb: (B, V, H, W, 3); rel_pose16: (B, V, 16)."""
        B, V, H, W, _ = rgb.shape
        stage0, stage1, stage2 = ResNetV2Stem(layers=self.resnet_layers,
                                              width=self.resnet_width,
                                              dtype=self.dtype,
                                              name='backbone')(
            rgb.reshape(B * V, H, W, 3))

        Hg, Wg = stage2.shape[1], stage2.shape[2]
        grids = stage2.reshape(B, V, Hg, Wg, stage2.shape[-1])
        taps = (max(self.vit_depth * 3 // 4 - 1, 0), self.vit_depth - 1)
        tap3, tap4 = MultiViewViT(width=self.vit_width, depth=self.vit_depth,
                                  heads=self.vit_heads, remat=self.remat,
                                  taps=(8, 11) if self.vit_depth == 12
                                  else taps,
                                  pretrain_grid=self.pretrain_grid,
                                  dtype=self.dtype, name='vit')(
            grids, rel_pose16)

        # Reassemble ViT tokens into 2D grids (act_postprocess3/4,
        # midas/vit.py:478-509).
        def tokens_to_grid(tokens):
            t = ProjectReadout(self.vit_width, dtype=self.dtype)(tokens)
            return t.reshape(B * V, Hg, Wg, self.vit_width)

        layer3 = tokens_to_grid(tap3)
        layer3 = nn.Conv(self.vit_width, (1, 1), dtype=self.dtype,
                         name='post3_conv')(layer3)
        layer4 = tokens_to_grid(tap4)
        layer4 = nn.Conv(self.vit_width, (1, 1), dtype=self.dtype,
                         name='post4_conv1')(layer4)
        layer4 = nn.Conv(self.vit_width, (3, 3), strides=(2, 2), padding=1,
                         dtype=self.dtype, name='post4_conv2')(layer4)

        # scratch.layerN_rn 3x3 no-bias projections (midas/blocks.py:62-73).
        rn = lambda name: nn.Conv(self.features, (3, 3), padding=1,
                                  use_bias=False, dtype=self.dtype, name=name)
        layer1_rn = rn('layer1_rn')(stage0)
        layer2_rn = rn('layer2_rn')(stage1)
        layer3_rn = rn('layer3_rn')(layer3)
        layer4_rn = rn('layer4_rn')(layer4)

        # RefineNet cascade (dpt_depth.py:78-81).
        path4 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name='refinenet4')(layer4_rn)
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name='refinenet3')(path4, layer3_rn)
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name='refinenet2')(path3, layer2_rn)
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name='refinenet1')(path2, layer1_rn)

        return path2, path1
