"""Image utilities: normalization and exact bilinear resizing.

Bilinear resize is implemented as two separable interpolation matmuls
(out = Wy @ img @ Wx^T). This is exact, differentiable, supports both
align_corners conventions (the reference mixes them: F.interpolate
align_corners=True in the DPT fusion blocks `midas/blocks.py:335-337` and
align_corners=False for the pos-embed resize `midas/vit.py:116`), and maps
onto the MXU instead of gather units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(rgb01: Array) -> Array:
    """Channel-last ImageNet normalization. Ref: utils/util.py:21-31."""
    return (rgb01 - IMAGENET_MEAN) / IMAGENET_STD


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation weights."""
    if n_out == 1:
        src = np.zeros(1)
    elif align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = (np.arange(n_out) + 0.5) * scale - 0.5
    src = np.clip(src, 0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), lo] += 1.0 - w_hi
    mat[np.arange(n_out), hi] += w_hi
    return mat


def resize_bilinear(x: Array, out_hw: tuple[int, int],
                    align_corners: bool = False) -> Array:
    """Resize (..., H, W, C) to (..., H_out, W_out, C) bilinearly."""
    H, W, C = x.shape[-3:]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    wy = jnp.asarray(_interp_matrix(H, Ho, align_corners), x.dtype)
    wx = jnp.asarray(_interp_matrix(W, Wo, align_corners), x.dtype)
    x = jnp.einsum('oh,...hwc->...owc', wy, x)
    return jnp.einsum('ow,...hwc->...hoc', wx, x)


def upsample2x_align_corners(x: Array) -> Array:
    """The DPT fusion upsample: scale_factor=2, bilinear, align_corners=True.

    Ref: midas/blocks.py:335-337.
    """
    H, W = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * H, 2 * W), align_corners=True)
