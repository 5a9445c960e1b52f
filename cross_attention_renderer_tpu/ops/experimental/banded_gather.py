"""Banded one-hot bilinear gather (Pallas TPU kernel) — the fast epipolar
gather.

The flat one-hot formulation (ops/pallas_gather.py) loses because the
(S, H*W) selector costs as many VPU cycles as the MXU contraction it feeds.
This kernel exploits the epipolar structure instead: the table is split into
row BANDS (~1024 positions each) walked on the inner grid axis, the output
block stays VMEM-resident across bands, and a scalar-prefetched hit mask
skips the selector/matmul for bands a sample block never touches. Because a
ray's 64 epipolar samples lie on one line segment, a block of consecutive
rays touches only a few bands — compare work drops from O(S·H·W) to
O(S·touched_positions) while the gather itself still runs on the MXU:

    out[s, c] += sum_r sel_b[s, r] * band_b[r, c]          (per hit band b)
    sel_b[s, r] = sum_corner w[s,corner] * (r == idx[s,corner] - b*band)

Per-level cost at 1M samples (v5e): band DMA ~2-8 GB total, selector ~2-4 G
VPU ops, contraction a few hundred GFLOP — several times faster than XLA's
64 GB/s row-take. Forward-optimized; gradients fall back to the take path
(training ray counts are tiny; full-image rendering is forward-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cross_attention_renderer_tpu.ops.pallas_gather import _corner_indices

Array = jax.Array

SAMPLE_BLOCK = 2048
BAND_POSITIONS = 1024      # positions (rows*W) per band


def _banded_kernel(hits_ref, idx_ref, w_ref, band_ref, out_ref):
    """Grid (sample_block i, band b). Shapes: idx/w (S, 4), band (BP, C),
    out (S, C) resident across the inner band axis."""
    b = pl.program_id(1)
    n_bands = pl.num_programs(1)
    i = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(hits_ref[i * n_bands + b] > 0)
    def _():
        S = idx_ref.shape[0]
        BP = band_ref.shape[0]
        base = b * BP
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, BP), 1)
        sel = jnp.zeros((S, BP), jnp.bfloat16)
        for c in range(4):
            local = idx_ref[:, c][:, None] - base
            sel = sel + jnp.where(iota == local,
                                  w_ref[:, c][:, None], 0.0
                                  ).astype(jnp.bfloat16)
        out_ref[:] += jnp.dot(sel, band_ref[:],
                              preferred_element_type=jnp.float32
                              ).astype(out_ref.dtype)


def _banded_gather(fm_flat: Array, idx: Array, w: Array) -> Array:
    """(HW, C) table, (N, 4) corner rows + weights -> (N, C)."""
    HW, C = fm_flat.shape
    N = idx.shape[0]
    out_dtype = jnp.float32
    BP = min(BAND_POSITIONS, HW)
    assert HW % BP == 0, (HW, BP)
    n_bands = HW // BP
    S = SAMPLE_BLOCK
    pad = (-N) % S
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // S

    # conservative per-(block, band) hit mask from block row-extent
    blk = idx.reshape(n_blocks, S * 4)
    blk_min = jnp.min(blk, axis=1) // BP
    blk_max = jnp.max(blk, axis=1) // BP
    bands = jnp.arange(n_bands, dtype=jnp.int32)
    hits = ((bands[None, :] >= blk_min[:, None])
            & (bands[None, :] <= blk_max[:, None])).astype(jnp.int32)
    hits = hits.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_bands),
        in_specs=[
            pl.BlockSpec((S, 4), lambda i, b, hits: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 4), lambda i, b, hits: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, C), lambda i, b, hits: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, C), lambda i, b, hits: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _banded_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N + pad, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hits, idx, w, fm_flat.astype(jnp.bfloat16))
    return out[:N].astype(fm_flat.dtype)


def _forward(features: Array, coords_ndc: Array, padding_mode: str) -> Array:
    B, H, W, C = features.shape
    N = coords_ndc.shape[1]
    idx, w = _corner_indices(features.shape, coords_ndc, padding_mode)
    base = jax.lax.broadcasted_iota(jnp.int32, (B, N, 1), 0) * (H * W)
    idx_flat = (idx + base).reshape(B * N, 4)
    w_flat = w.reshape(B * N, 4).astype(jnp.float32)
    out = _banded_gather(features.reshape(B * H * W, C), idx_flat, w_flat)
    return out.reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_banded(features: Array, coords_ndc: Array,
                       padding_mode: str = 'border') -> Array:
    """Banded Pallas bilinear sampler; same semantics as ops.grid_sample."""
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


grid_sample_banded.defvjp(_fwd, _bwd)
