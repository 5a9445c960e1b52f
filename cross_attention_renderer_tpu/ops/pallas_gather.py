"""Pallas bilinear gather: one-hot matmul formulation.

XLA's row-``take`` lowers scattered epipolar gathers to ~64 GB/s effective on
v5e — 8% of HBM bandwidth — and it dominates the whole render
(micro-benchmarks in BENCH_NOTES). The TPU-native formulation: keep the
feature map resident in VMEM, turn the four bilinear corners of a block of
samples into a 4-sparse selector matrix built on the VPU (iota-compare), and
contract it against the table on the MXU:

    out[s, c] = sum_r selector[s, r] * fm[r, c],
    selector[s, r] = sum_corner w_corner[s] * (r == idx_corner[s])

The selector never touches HBM, the table is read once per grid step from
VMEM, and the "gather" runs at matmul speed. For the renderer's pyramid
(4096/16384/65536-row tables, 256/256/64 channels) this is 3-6x faster than
the take path and fully differentiable via a custom VJP whose backward is
the transposed one-hot matmul (a scatter-add), implemented with the same
trick.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _sample_block(hw: int) -> int:
    """Sample-block size: the kernel's big VMEM temporaries are the (S, HW)
    int32 iota (4 B) and bf16 selector (2 B); keep them ~2 MB together."""
    budget = 2 * 1024 * 1024 // 6
    s = max(budget // hw, 8)
    return min(1 << (s.bit_length() - 1), 256)


def _gather_kernel(idx_ref, w_ref, fm_ref, out_ref):
    """Block shapes: idx (S, 4) i32, w (S, 4) f32, fm (HW, C), out (S, C)."""
    S = idx_ref.shape[0]
    HW = fm_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, HW), 1)
    sel = jnp.zeros((S, HW), jnp.bfloat16)
    for c in range(4):
        hit = iota == idx_ref[:, c][:, None]
        sel = sel + jnp.where(hit, w_ref[:, c][:, None], 0.0).astype(
            jnp.bfloat16)
    out_ref[:] = jnp.dot(sel, fm_ref[:],
                         preferred_element_type=jnp.float32).astype(
                             out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def _onehot_gather(fm_flat: Array, idx: Array, w: Array) -> Array:
    """(HW, C) table, (N, 4) corner rows, (N, 4) corner weights -> (N, C)."""
    HW, C = fm_flat.shape
    N = idx.shape[0]
    out_dtype = fm_flat.dtype
    fm16 = fm_flat.astype(jnp.bfloat16)  # table resident in VMEM as bf16
    S = _sample_block(HW)
    pad = (-N) % S
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
    grid = ((N + pad) // S,)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, w, fm16)
    return out[:N]


def _corner_indices(features_shape, coords_ndc, padding_mode):
    """Shared corner/weight math (same semantics as ops.grid_sample)."""
    B, H, W, C = features_shape
    x = (coords_ndc[..., 0] + 1.0) * W * 0.5 - 0.5
    y = (coords_ndc[..., 1] + 1.0) * H * 0.5 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    corners, weights = [], []
    for dy, wy_c in ((0, 1 - wy), (1, wy)):
        for dx, wx_c in ((0, 1 - wx), (1, wx)):
            ix, iy = x0i + dx, y0i + dy
            flat = (jnp.clip(iy, 0, H - 1) * W
                    + jnp.clip(ix, 0, W - 1))
            wgt = wx_c * wy_c
            if padding_mode == 'zeros':
                inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0)
                       & (iy <= H - 1))
                wgt = wgt * inb.astype(wgt.dtype)
            corners.append(flat)
            weights.append(wgt)
    idx = jnp.stack(corners, axis=-1)      # (B, N, 4)
    w = jnp.stack(weights, axis=-1)        # (B, N, 4)
    return idx, w


def _forward(features: Array, coords_ndc: Array,
             padding_mode: str) -> Array:
    B, H, W, C = features.shape
    N = coords_ndc.shape[1]
    idx, w = _corner_indices(features.shape, coords_ndc, padding_mode)
    # fold the batch into the row index and run one kernel over all samples
    base = jax.lax.broadcasted_iota(jnp.int32, (B, N, 1), 0) * (H * W)
    idx_flat = (idx + base).reshape(B * N, 4)
    w_flat = w.reshape(B * N, 4).astype(jnp.float32)
    out = _onehot_gather(features.reshape(B * H * W, C), idx_flat, w_flat)
    return out.reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_pallas(features: Array, coords_ndc: Array,
                       padding_mode: str = 'border') -> Array:
    """Drop-in replacement for ops.grid_sample on TPU.

    features: (B, H, W, C); coords_ndc: (B, N, 2) -> (B, N, C). The fused
    forward runs on the MXU; gradients (features only — sample coordinates
    derive from camera geometry, not parameters) fall back to the take-based
    path's transpose. Coordinate gradients are defined but routed through
    the same fallback.
    """
    return _forward(features, coords_ndc, padding_mode)


def _fwd(features, coords_ndc, padding_mode):
    return _forward(features, coords_ndc, padding_mode), (features,
                                                          coords_ndc)


def _bwd(padding_mode, residuals, g):
    from cross_attention_renderer_tpu.ops.grid_sample import grid_sample
    features, coords_ndc = residuals
    _, vjp = jax.vjp(lambda f, c: grid_sample(f, c, padding_mode),
                     features, coords_ndc)
    return vjp(g)


grid_sample_pallas.defvjp(_fwd, _bwd)


def grid_sample_auto(features: Array, coords_ndc: Array,
                     padding_mode: str = 'border') -> Array:
    """Pallas path on TPU, jnp take path elsewhere."""
    from cross_attention_renderer_tpu.ops.grid_sample import grid_sample
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    B, H, W, C = features.shape
    small_table = B * H * W * C * 2 <= 4 * 1024 * 1024
    if on_tpu and small_table and os.environ.get('CAR_BANDED_GATHER'):
        # Round-1 default for small tables; superseded by the tightened
        # take path (clip-mode, weight-folded mask, free-view corner
        # slices: ~16 vs ~17-18.5 ms/level at 1M samples, and bf16 output
        # without a convert). Kept behind an env flag for comparison.
        from cross_attention_renderer_tpu.ops.experimental.banded_gather import (
            grid_sample_banded)
        return grid_sample_banded(features, coords_ndc, padding_mode)
    if on_tpu and os.environ.get('CAR_PALLAS_GATHER'):
        return grid_sample_pallas(features, coords_ndc, padding_mode)
    # v5e: the flat row-take with the fused bilinear epilogue is the best
    # unsorted formulation measured (one (4M) take ~13.4 ms + ~3 ms
    # combine at 1M samples x 256ch); the flat one-hot matmul spends as
    # long building the selector on the VPU as the MXU contraction.
    return grid_sample(features, coords_ndc, padding_mode)
