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
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def pack_cells(features: Array) -> Array:
    """(B, H, W, C) -> (B, H, W, 4C) cell table for the packed gather.

    ``packed[y, x] = [T[y,x] ‖ T[y,x+1] ‖ T[y+1,x] ‖ T[y+1,x+1]]`` with
    edge-clamped shifts — one fused elementwise build (~0.2 ms at flagship
    sizes). Build it ONCE per (scene, render call) and reuse across the
    self/cross gather streams via :func:`grid_sample_packed`.
    """
    shift_x = jnp.concatenate([features[:, :, 1:], features[:, :, -1:]],
                              axis=2)
    shift_y = jnp.concatenate([features[:, 1:], features[:, -1:]], axis=1)
    shift_xy = jnp.concatenate([shift_x[:, 1:], shift_x[:, -1:]], axis=1)
    return jnp.concatenate([features, shift_x, shift_y, shift_xy], axis=-1)


def cell_rows_and_slot_weights(hw: tuple[int, int], coords_ndc: Array,
                               padding_mode: str = 'border',
                               image_id: Optional[Array] = None,
                               weight_dtype=None
                               ) -> tuple[Array, Array]:
    """Cell row index + per-slot bilinear weights for a packed-cell table.

    The packed-cell gather's address/weight math, split out so fused
    consumers (ops/gather_epilogue.py) can run the XLA row-take themselves
    and do the combine in VMEM.

    Exact border/zeros semantics via slot remapping: the cell origin is
    clamped to [0, H-2]x[0, W-2]; each true corner's weight lands in the
    slot its CLAMPED position occupies within that cell (at the image edge
    both x-corners clamp to the same column, so their weights sum —
    exactly torch's border behavior). For 'zeros', the out-of-bounds mask
    zeroes the true corner's weight first, and samples whose whole 2x2
    cell is out of bounds are pointed at row 0 — their weights are all
    zero, and aliasing the dead fetches onto one hot row keeps them out of
    HBM's way.

    Args:
      hw: (H, W) of the (unpacked) feature map.
      coords_ndc: (B, N, 2) in [-1, 1], (x, y), align_corners=False.
      padding_mode: 'border' or 'zeros'.
      image_id: optional (B, N) int32 map from sample to table image row
        block (default: its own batch row). Lets a caller sample image
        ``1 - v`` for view-v rays (the V=2 cross-exchange) without
        reshuffling the coords.

    Returns:
      (cell (B, N) int32 row indices into the (B*H*W, 4C)-flattened packed
      table, w_slot (B, N, 4) weights in ``weight_dtype`` (default f32)).
    """
    H, W = hw
    B, N = coords_ndc.shape[:2]
    x = (coords_ndc[..., 0] + 1.0) * W * 0.5 - 0.5
    y = (coords_ndc[..., 1] + 1.0) * H * 0.5 - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wdt = weight_dtype or jnp.float32
    wx = (x - x0).astype(wdt)
    wy = (y - y0).astype(wdt)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    if image_id is None:
        base = (jax.lax.broadcasted_iota(jnp.int32, (B, N), 0) * (H * W))
    else:
        base = image_id * (H * W)
    cell = base + y0c * W + x0c                            # (B, N)

    w_slot = [0.0, 0.0, 0.0, 0.0]
    for dy, wy_c in ((0, 1 - wy), (1, wy)):
        for dx, wx_c in ((0, 1 - wx), (1, wx)):
            w_c = wx_c * wy_c
            if padding_mode == 'zeros':
                inb = ((x0i + dx >= 0) & (x0i + dx <= W - 1)
                       & (y0i + dy >= 0) & (y0i + dy <= H - 1))
                w_c = w_c * inb.astype(w_c.dtype)
            sx = jnp.clip(x0i + dx, 0, W - 1) - x0c        # {0, 1}
            sy = jnp.clip(y0i + dy, 0, H - 1) - y0c
            for k in range(4):
                hit = ((sy * 2 + sx) == k).astype(w_c.dtype)
                w_slot[k] = w_slot[k] + w_c * hit
    w_slot = jnp.stack(w_slot, axis=-1)                    # (B, N, 4)
    if padding_mode == 'zeros':
        # All-OOB samples: alias the fetch onto row 0 (weights already 0).
        # Wide-baseline cross-projections put a large sample fraction fully
        # outside the image; repeated reads of one hot row are nearly free
        # next to scattered dead-row traffic.
        dead = jnp.sum(w_slot, axis=-1) <= 0.0
        cell = jnp.where(dead, 0, cell)
    return cell, w_slot


def grid_sample_packed(packed: Array, coords_ndc: Array,
                       padding_mode: str = 'border') -> Array:
    """Bilinear sample from a :func:`pack_cells` table.

    PACKED-CELL gather: each sample fetches its whole 2x2 bilinear cell as
    ONE row. XLA's row-take costs ~1.5 ns/row + ~3.6e-3 ns/byte on v5e
    (BENCH_NOTES.md): 1M rows of 4C beat 4M rows of C by ~4.5 ms per
    256-ch level. The combine is four FREE lane-slices (4C is a
    128-multiple) fused into one weighted add.

    Address/weight math in :func:`cell_rows_and_slot_weights`.
    """
    B, H, W, C4 = packed.shape
    C = C4 // 4
    N = coords_ndc.shape[1]
    # int8 tables (the quantized fast-eval mode, train/evaluation.py
    # quantize_pyramid) combine in f32; the dequant scale is folded into
    # the fuse kernel downstream.
    wdt = (packed.dtype if jnp.issubdtype(packed.dtype, jnp.floating)
           else jnp.float32)
    cell, w_slot = cell_rows_and_slot_weights(
        (H, W), coords_ndc, padding_mode, weight_dtype=wdt)
    vals = jnp.take(packed.reshape(B * H * W, C4),
                    cell.reshape(-1), axis=0, mode='clip') # (B*N, 4C)
    M = B * N
    w_flat = w_slot.reshape(M, 4)
    out = None
    for k in range(4):
        term = (jax.lax.slice_in_dim(vals, k * C, (k + 1) * C,
                                     axis=1).astype(wdt)
                * w_flat[:, k:k + 1])
        out = term if out is None else out + term
    return out.reshape(B, N, C)


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

    Convenience wrapper: packs the cell table and samples it. Hot callers
    (the renderer) pack once per call and use :func:`grid_sample_packed`
    directly so the build is shared across gather streams.
    """
    return grid_sample_packed(pack_cells(features), coords_ndc,
                              padding_mode)


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


def pack_pyramid(pyramid: tuple[Array, ...]) -> tuple[Array, ...]:
    """:func:`pack_cells` for every level of a feature pyramid."""
    return tuple(pack_cells(fm) for fm in pyramid)


def grid_sample_pyramid_packed(packed_pyramid: tuple[Array, ...],
                               coords_ndc: Array,
                               padding_mode: str = 'border') -> Array:
    """:func:`grid_sample_pyramid` over pre-packed levels (pack once per
    render call, sample many streams)."""
    return jnp.concatenate(
        [grid_sample_packed(p, coords_ndc, padding_mode)
         for p in packed_pyramid], axis=-1)


def grid_sample_pyramid_parts(pyramid: tuple[Array, ...], coords_ndc: Array,
                              padding_mode: str = 'border'
                              ) -> tuple[Array, ...]:
    """Like :func:`grid_sample_pyramid` but WITHOUT the channel concat —
    one (B, N, Ci) array per level, in pyramid order. Feeding the parts
    straight into a SplitDense avoids materializing the (..., 576) concat
    (a lane-tile-padded copy, ~8 ms at flagship sizes)."""
    from cross_attention_renderer_tpu.ops.pallas_gather import (
        grid_sample_auto)
    return tuple(grid_sample_auto(fm, coords_ndc, padding_mode)
                 for fm in pyramid)
