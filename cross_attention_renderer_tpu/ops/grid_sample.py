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

    The four bilinear corners across the whole batch are fetched with ONE
    flat row-take from a (B*H*W, C) matrix — XLA lowers a single large
    axis-0 take far better than batched/vmapped gathers (measured ~10x on
    v5e vs the vmap formulation).
    """
    B, H, W, C = features.shape
    N = coords_ndc.shape[1]
    x = (coords_ndc[..., 0] + 1.0) * W * 0.5 - 0.5
    y = (coords_ndc[..., 1] + 1.0) * H * 0.5 - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(features.dtype)
    wy = (y - y0).astype(features.dtype)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    base = (jax.lax.broadcasted_iota(jnp.int32, (B, N), 0) * (H * W))

    def flat_idx(ix, iy):
        return base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)

    # Sample-major corner interleave: the 4 corners of one sample are
    # adjacent rows of the take (locality), and the bilinear combine is one
    # weighted reduce over a size-4 axis — no slices, no per-corner madd
    # chain. mode='clip' skips XLA's out-of-bounds select epilogue on the
    # (4N, C) gather output (indices are already clamped in flat_idx); for
    # 'zeros' padding the OOB mask is folded into the (N, 4) WEIGHTS, never
    # touching the wide gathered tensor.
    corners = jnp.stack([
        flat_idx(x0i, y0i), flat_idx(x0i + 1, y0i),
        flat_idx(x0i, y0i + 1), flat_idx(x0i + 1, y0i + 1)],
        axis=-1)                                           # (B, N, 4)
    w4 = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                    (1 - wx) * wy, wx * wy], axis=-1)      # (B, N, 4)

    if padding_mode == 'zeros':
        def inb(ix, iy):
            return ((ix >= 0) & (ix <= W - 1) & (iy >= 0)
                    & (iy <= H - 1)).astype(w4.dtype)
        mask = jnp.stack([inb(x0i, y0i), inb(x0i + 1, y0i),
                          inb(x0i, y0i + 1), inb(x0i + 1, y0i + 1)],
                         axis=-1)
        w4 = w4 * mask

    # ONE flat axis-0 take — XLA lowers it far better than batched or
    # multi-dim-index gathers (both measured slower on v5e).
    vals = jnp.take(features.reshape(B * H * W, C),
                    corners.reshape(-1), axis=0, mode='clip')
    return (vals.reshape(B, N, 4, C) * w4[..., None]).sum(axis=2)


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
    from cross_attention_renderer_tpu.ops.pallas_gather import (
        grid_sample_auto)
    return jnp.concatenate(
        [grid_sample_auto(fm, coords_ndc, padding_mode) for fm in pyramid],
        axis=-1)
