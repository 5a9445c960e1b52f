"""Training losses.

Behavioral reference: ``loss_functions.py`` in the reference repo.
  * L1 image loss with NaN zeroing (loss_functions.py:74-80),
  * depth variance regularizer on 32x32 patches, gated by the per-sample
    patch mask and weighted by ``l2_weight`` (loss_functions.py:120-129),
  * LPIPS(VGG) on 32x32 patches x0.1, same mask gate
    (loss_functions.py:102-118) — see
    :mod:`cross_attention_renderer_tpu.losses.lpips`.

All losses are pure functions of (model_out, gt) -> scalar dict; no modules,
no state.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

PATCH = 32  # LPIPS/depth losses run on 32x32 ray patches (loss_functions.py:107)


def image_loss(model_out: dict, gt: dict) -> Array:
    """Mean absolute error with NaN scrubbing. Ref: loss_functions.py:74-80."""
    gt_rgb = jnp.nan_to_num(gt['rgb'], nan=0.0)
    rgb = jnp.nan_to_num(model_out['rgb'], nan=0.0)
    return jnp.abs(gt_rgb - rgb).mean()


def depth_smoothness_loss(model_out: dict, gt: dict,
                          l2_weight: float = 1e-3) -> Array:
    """Variance of per-patch attention depth, masked to patch-sampled rays.

    Ref: loss_functions.py:120-129. Rays must be a whole number of 32x32
    patches (the patch sampler guarantees this).
    """
    depth = model_out['depth_ray'][..., 0]
    if depth.size % (PATCH * PATCH) != 0:
        # depth smoothness is defined on 32x32 patch samples only; with any
        # other ray layout the mask would be 0 anyway (the sampler sets
        # mask=1 only for contiguous patches, realestate10k_dataio.py:380-393)
        return jnp.zeros((), depth.dtype)
    depth = depth.reshape(-1, PATCH * PATCH)
    mean = depth.mean(axis=-1, keepdims=True)
    dist = l2_weight * jnp.square(depth - mean).mean(axis=-1)
    mask = gt['mask'].reshape(-1)
    return (dist * mask).mean()


class LFLoss:
    """Composite loss. Ref: ``LFLoss`` (loss_functions.py:83-132).

    Args:
      l2_weight: depth-variance weight (reference flag --l2_coeff).
      depth: enable the depth smoothness term (train only).
      lpips_fn: optional callable (pred_01, gt_01) -> per-image LPIPS; when
        set, applied on 32x32 patches with weight 0.1
        (loss_functions.py:115-118).
    """

    def __init__(self, l2_weight: float = 1e-3, depth: bool = False,
                 lpips_fn: Optional[Callable] = None):
        self.l2_weight = l2_weight
        self.depth = depth
        self.lpips_fn = lpips_fn

    def __call__(self, model_out: dict, gt: dict, val: bool = False) -> dict:
        losses = {'img_loss': image_loss(model_out, gt)}
        if self.lpips_fn is not None:
            pred = model_out['rgb'].reshape(-1, PATCH, PATCH, 3)
            target = gt['rgb'].reshape(-1, PATCH, PATCH, 3)
            mask = gt['mask'].reshape(-1)
            if mask.shape[0] == pred.shape[0]:
                pred = pred * mask[:, None, None, None]
                target = target * mask[:, None, None, None]
            losses['lpips_loss'] = 0.1 * jnp.mean(
                self.lpips_fn(pred, target))
        if self.depth and not val:
            losses['depth_loss'] = depth_smoothness_loss(
                model_out, gt, self.l2_weight)
        return losses


def total_loss(losses: dict) -> Array:
    return sum(jnp.asarray(v).mean() for v in losses.values())
