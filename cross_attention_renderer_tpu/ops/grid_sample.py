"""Bilinear feature-map sampling (the epipolar gather hot op).

TPU-native equivalent of the reference's ``F.grid_sample(...)`` calls
(`models.py:278,317,400`), with identical semantics:

  * bilinear interpolation,
  * ``align_corners=False`` coordinate mapping
    ``x_pix = ((x_ndc + 1) * W - 1) / 2``,
  * padding ``border`` (clamp) or ``zeros`` (out-of-bounds corners
    contribute nothing).

Layout is channel-LAST (``(..., H, W, C)`` features, ``(..., N, 2)`` ndc
coords) — the natural TPU layout: the channel dim maps onto the 128-wide
lane dimension, and the 4-corner gather becomes four row-gathers from an
``(H*W, C)`` matrix followed by a fused weighted sum (all VPU work, no
transposes).

A Pallas kernel for the fused gather+attention lives in
``cross_attention_renderer_tpu.ops.epipolar_attention``; this module is the
XLA reference path and the autodiff-friendly fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_rows(fm_flat: Array, idx: Array) -> Array:
    """Gather rows of (H*W, C) at flat indices (N,) -> (N, C)."""
    return jnp.take(fm_flat, idx, axis=0)


@functools.partial(jax.jit, static_argnames=('padding_mode',))
def grid_sample(features: Array, coords_ndc: Array,
                padding_mode: str = 'border') -> Array:
    """Sample ``features`` bilinearly at ndc ``coords_ndc``.

    Args:
      features: (B, H, W, C) feature maps.
      coords_ndc: (B, N, 2) sample coordinates in [-1, 1], (x, y) order.
      padding_mode: 'border' or 'zeros' (torch grid_sample semantics,
        align_corners=False).

    Returns:
      (B, N, C) sampled features.
    """
    B, H, W, C = features.shape
    x = (coords_ndc[..., 0] + 1.0) * W * 0.5 - 0.5
    y = (coords_ndc[..., 1] + 1.0) * H * 0.5 - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(ix, iy):
        ix_c = jnp.clip(ix, 0, W - 1)
        iy_c = jnp.clip(iy, 0, H - 1)
        flat = iy_c * W + ix_c
        vals = jax.vmap(_gather_rows)(features.reshape(B, H * W, C), flat)
        if padding_mode == 'zeros':
            inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            vals = vals * inb[..., None].astype(vals.dtype)
        return vals

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)

    wx = wx[..., None].astype(features.dtype)
    wy = wy[..., None].astype(features.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_pyramid(pyramid: tuple[Array, ...], coords_ndc: Array,
                        padding_mode: str = 'border') -> Array:
    """Sample every level of a feature pyramid at the same ndc coords and
    concatenate channels.

    TPU-native form of the reference's per-level grid_sample list
    comprehension (`models.py:278`).

    Args:
      pyramid: tuple of (B, Hi, Wi, Ci) maps (different resolutions OK).
      coords_ndc: (B, N, 2).

    Returns:
      (B, N, sum(Ci)).
    """
    return jnp.concatenate(
        [grid_sample(fm, coords_ndc, padding_mode) for fm in pyramid],
        axis=-1)
