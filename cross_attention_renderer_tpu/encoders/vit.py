"""Multi-view ViT-B/16 trunk with joint cross-view attention.

From-scratch Flax re-design of the reference's hooked/monkeypatched timm
hybrid (``vit_models.py:10-157`` + ``midas/vit.py:124-202``):

  * per-view tokens = 1x1 projection of the R50 stage-2 features + cls token,
  * resized 2D position embedding (bilinear, align_corners=False —
    ``midas/vit.py:107-121``) plus a learned **pose embedding**
    ``Dense(16 -> width)`` of the flattened relative cam2world added to every
    token (``midas/vit.py:134,180``),
  * all views concatenated into one ``(B, V*257, width)`` sequence processed
    jointly by every transformer block (``midas/vit.py:185-189``) — this is
    where cross-view information mixes,
  * instead of forward hooks, the two tap activations (blocks 8 and 11 for
    the DPT, ``midas/vit.py:417-418``) are returned explicitly.

The joint sequence is only V*257 = 514 tokens for stereo — attention here is
tiny next to the MXU matmuls, so standard dot-product attention (XLA fuses
it) is the right call; no flash/blockwise machinery needed at this length.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cross_attention_renderer_tpu.utils.image import resize_bilinear

Array = Any


class TransformerBlock(nn.Module):
    """Pre-LN ViT block (LN -> MHA -> res, LN -> MLP(GELU) -> res)."""
    width: int = 768
    heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False,
                         dtype=self.dtype, name='norm1')(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width,
            use_bias=True, dtype=self.dtype, name='attn')(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False,
                         dtype=self.dtype, name='norm2')(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype,
                     name='mlp_fc1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name='mlp_fc2')(h)
        return x + h


class MultiViewViT(nn.Module):
    """Joint-attention ViT over V views of tokenized R50 features.

    Input: (B, V, Hg, Wg, C_in) feature grids and (B, V, 16) flattened
    relative poses. Output: the block-8 and block-11 activations, each
    (B*V, 1 + Hg*Wg, width) with the cls token first (view-major layout,
    matching the reference's re-split at ``midas/vit.py:68-71``).
    """
    width: int = 768
    depth: int = 12
    heads: int = 12
    taps: tuple[int, int] = (8, 11)
    # pos_embed grid as stored in the checkpoint. The reference's encoder is
    # built at timm's default img_size=224 (vit_models.py:159-181 never
    # forwards an img_size, and the DPT 384px checkpoint at models.py:89 is
    # assigned but never loaded) -> 224/16 = 14x14 grid + cls = 197 tokens,
    # bilinearly resized to the runtime grid (midas/vit.py:107-121).
    pretrain_grid: int = 14
    # rematerialize transformer blocks in the backward pass (trades ~1/3 more
    # FLOPs for O(depth) less activation memory — enables bigger batches)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, grids: Array, rel_pose16: Array
                 ) -> tuple[Array, Array]:
        B, V, Hg, Wg, _ = grids.shape
        x = nn.Dense(self.width, dtype=self.dtype, name='patch_proj')(grids)
        x = x.reshape(B * V, Hg * Wg, self.width)

        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, self.width), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(x.dtype), (B * V, 1, self.width))
        x = jnp.concatenate([cls, x], axis=1)

        pos = self.param(
            'pos_embed', nn.initializers.normal(0.02),
            (1, 1 + self.pretrain_grid ** 2, self.width), jnp.float32)
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(
            1, self.pretrain_grid, self.pretrain_grid, self.width)
        pos_grid = resize_bilinear(pos_grid, (Hg, Wg), align_corners=False)
        pos_grid = pos_grid.reshape(1, Hg * Wg, self.width)
        pos = jnp.concatenate([pos_cls, pos_grid], axis=1).astype(x.dtype)

        pose_embed = nn.Dense(self.width, dtype=self.dtype,
                              name='pose_embed')(rel_pose16)
        pose_embed = pose_embed.reshape(B * V, 1, self.width)

        x = x + pos + pose_embed

        # Concatenate views into one joint sequence: (B, V*(1+N), width).
        tokens = x.shape[1]
        x = x.reshape(B, V * tokens, self.width)

        block_cls = (nn.remat(TransformerBlock) if self.remat
                     else TransformerBlock)
        tap_acts = {}
        for i in range(self.depth):
            x = block_cls(width=self.width, heads=self.heads,
                          dtype=self.dtype, name=f'block{i}')(x)
            if i in self.taps:
                tap_acts[i] = x

        # Re-split views (view-major): (B*V, 1+N, width).
        def split(a):
            return a.reshape(B * V, tokens, self.width)

        return split(tap_acts[self.taps[0]]), split(tap_acts[self.taps[1]])
