"""Sorted-stream windowed bilinear gather — the fast epipolar gather.

XLA lowers the renderer's scattered pyramid gathers (the TPU equivalent of
``F.grid_sample`` at reference models.py:278,317) to a row-``take`` running
at <10% of HBM bandwidth. Sorting the flattened sample stream by image row
costs ~4 ms per million samples on v5e (one ``argsort``), after which a
block of consecutive samples touches a tiny, *contiguous* row window of the
feature table (p50 span 70-380 positions at the flagship shapes, measured in
BENCH_NOTES.md). This kernel exploits that:

  * the table is viewed as row BANDS of ``band`` positions;
  * each 2048-sample block prefetches its own window of ``max_bands``
    consecutive bands (scalar-prefetched start index; revisited bands are
    deduplicated by Pallas, so a block pays DMA + compute only for the 1-3
    bands it actually spans);
  * within a visited band the 4 bilinear corners become a 4-sparse selector
    built on the VPU (iota-compare) and contracted on the MXU.

Correctness does NOT depend on coherence: corners falling outside a block's
window are accumulated by a residual ``take`` pass wrapped in
``jax.lax.cond``, so adversarial coordinate streams are exact and the
typical stream never pays for it.

The public entry points:

  * :func:`sort_stream` — build the sorted sample stream (perm + inverse).
  * :func:`grid_sample_sorted` — gather one pyramid level for a sorted
    stream with explicit per-sample image ids.

Gradients fall back to the XLA take path via a custom VJP (training ray
counts are small; full-image rendering is forward-only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SAMPLE_BLOCK = 2048
BAND = 256
MAX_BANDS = 8


def _on_tpu() -> bool:
    return jax.default_backend() in ('tpu', 'axon')


class SortedStream(NamedTuple):
    """A flattened (image-major) sample stream sorted by image row."""
    coords: Array        # (M, 2) ndc, sorted
    image_id: Array      # (M,) int32, sorted alongside
    perm: Array          # (M,) original -> sorted gather indices
    inv_perm: Array      # (M,) sorted -> original gather indices


def sort_stream(coords_ndc: Array, key_hw: tuple[int, int]) -> SortedStream:
    """Sort a batched coordinate stream by image row at a canonical scale.

    Args:
      coords_ndc: (B, N, 2) per-image sample coordinates in [-1, 1].
      key_hw: (H, W) of the finest pyramid level — the sort key is the
        flattened (image, y, x) pixel index at this scale, so every coarser
        level of the same pyramid is row-coherent under the same order.
    """
    B, N, _ = coords_ndc.shape
    H, W = key_hw
    x = jnp.clip(((coords_ndc[..., 0] + 1.0) * W * 0.5 - 0.5), 0, W - 1)
    y = jnp.clip(((coords_ndc[..., 1] + 1.0) * H * 0.5 - 0.5), 0, H - 1)
    key = (jax.lax.broadcasted_iota(jnp.int32, (B, N), 0) * (H * W)
           + y.astype(jnp.int32) * W + x.astype(jnp.int32))
    perm = jnp.argsort(key.reshape(-1)).astype(jnp.int32)
    inv_perm = jnp.argsort(perm).astype(jnp.int32)
    flat = coords_ndc.reshape(B * N, 2)
    image_id = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0).reshape(-1)
    return SortedStream(coords=jnp.take(flat, perm, axis=0),
                        image_id=jnp.take(image_id, perm, axis=0),
                        perm=perm, inv_perm=inv_perm)


def unsort(x: Array, stream: SortedStream) -> Array:
    """(M, ...) sorted-order array -> original order."""
    return jnp.take(x, stream.inv_perm, axis=0)


def _corners_flat(h: int, w: int, c_dtype, coords: Array, image_id: Array,
                  padding_mode: str) -> tuple[Array, Array]:
    """(M, 2) ndc + (M,) image id -> (M, 4) folded corner rows + weights.

    Zero-weight corners are remapped to the sample's first corner so they
    never widen a block's row window (they contribute nothing either way).
    """
    x = (coords[..., 0] + 1.0) * w * 0.5 - 0.5
    y = (coords[..., 1] + 1.0) * h * 0.5 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(c_dtype)
    wy = (y - y0).astype(c_dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    base = image_id * (h * w)
    idxs, wgts = [], []
    for dy, wy_c in ((0, 1 - wy), (1, wy)):
        for dx, wx_c in ((0, 1 - wx), (1, wx)):
            ix, iy = x0i + dx, y0i + dy
            flat = base + jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
            wgt = wx_c * wy_c
            if padding_mode == 'zeros':
                inb = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
                wgt = wgt * inb.astype(wgt.dtype)
            idxs.append(flat)
            wgts.append(wgt)
    idx = jnp.stack(idxs, axis=-1)
    w_ = jnp.stack(wgts, axis=-1)
    idx = jnp.where(w_ != 0, idx, idx[:, :1])
    return idx, w_


def _resident_kernel(start_ref, idx_ref, w_ref, table_ref, out_ref, *,
                     window: int):
    """One grid step per sample block; the WHOLE table is VMEM-resident.

    The block's (window, C) slice is cut with one dynamic slice, the 4
    bilinear corners become a 4-sparse (S, window) selector built on the
    VPU, and the gather is an MXU contraction. No banded sub-grid: the
    previous kernel spent ~6 us of sequencing per (block, band) step with
    only ~1.5 of 8 steps doing work.
    """
    i = pl.program_id(0)
    base = start_ref[i]
    # starts are host-aligned to 256 rows; Mosaic needs the static proof
    win = table_ref[pl.ds(pl.multiple_of(base, 256), window), :]   # (W, C)
    S = idx_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, window), 1)
    sel = jnp.zeros((S, window), jnp.bfloat16)
    for c in range(4):
        local = idx_ref[:, c][:, None] - base
        sel = sel + jnp.where(iota == local, w_ref[:, c][:, None],
                              0.0).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(
        sel, win, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def resident_gather(fm_flat: Array, idx: Array, w: Array,
                    sample_block: int = SAMPLE_BLOCK,
                    window: int = 0,
                    out_dtype=None) -> Array:
    """(HW, C) bf16 table + (M, 4) folded corners/weights -> (M, C).

    Fast when ``idx`` rows are sorted/coherent (each block's corners fit a
    ``window``-position slice); exact for any input — out-of-window corners
    are accumulated by a residual take pass inside ``lax.cond``.

    ``window=0`` picks the measured-optimal width for the table size
    (v5e sweep, tools/micro_resident_sweep.py): 512 positions for tables
    up to 8k rows, 1024 above. ``out_dtype`` defaults to the table dtype —
    writing bf16 straight from the kernel saves the downstream cast's HBM
    round-trip.
    """
    HW, C = fm_flat.shape
    M = idx.shape[0]
    if out_dtype is None:
        out_dtype = fm_flat.dtype
    if not window:
        window = 512 if HW <= (1 << 13) else 1024
    Wd = min(window, HW)
    # pad table so any clamped window start has a full slice
    hw_pad = (-HW) % Wd
    if hw_pad:
        fm_flat = jnp.pad(fm_flat, ((0, hw_pad), (0, 0)))
        HW += hw_pad
    S = sample_block
    pad = (-M) % S
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)), mode='edge')
        w = jnp.pad(w, ((0, pad), (0, 0)))
    n_blocks = (M + pad) // S

    blk = idx.reshape(n_blocks, S * 4)
    lo = jnp.min(blk, axis=1)
    # align starts down to 256 rows (sublane-friendly dynamic slices)
    start = jnp.clip((lo // 256) * 256, 0, HW - Wd).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((S, 4), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 4), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            # whole table, constant index map -> DMA'd once, stays resident
            pl.BlockSpec((HW, C), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, C), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_resident_kernel, window=Wd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M + pad, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(start, idx, w.astype(jnp.float32), fm_flat.astype(jnp.bfloat16))
    out = out[:M]

    win_lo = jnp.repeat(start, S)[:M, None]
    outside = (idx[:M] < win_lo) | (idx[:M] >= win_lo + Wd)
    w_resid = jnp.where(outside, w[:M], 0.0)
    has_resid = jnp.any(w_resid != 0)

    def with_resid(o):
        return o + _take_gather(fm_flat, idx[:M], w_resid).astype(o.dtype)

    return jax.lax.cond(has_resid, with_resid, lambda o: o, out)


def _windowed_kernel(start_ref, hits_ref, idx_ref, w_ref, band_ref,
                     out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < hits_ref[i])
    def _():
        S = idx_ref.shape[0]
        BP = band_ref.shape[0]
        base = (start_ref[i] + j) * BP
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, BP), 1)
        sel = jnp.zeros((S, BP), jnp.bfloat16)
        for c in range(4):
            local = idx_ref[:, c][:, None] - base
            sel = sel + jnp.where(iota == local, w_ref[:, c][:, None],
                                  0.0).astype(jnp.bfloat16)
        out_ref[:] += jnp.dot(sel, band_ref[:],
                              preferred_element_type=jnp.float32)


def _take_gather(fm_flat: Array, idx: Array, w: Array) -> Array:
    """XLA row-take reference/residual path: (M, 4) -> (M, C)."""
    out = None
    for c in range(4):
        g = jnp.take(fm_flat, idx[:, c], axis=0) * w[:, c:c + 1].astype(
            fm_flat.dtype)
        out = g if out is None else out + g
    return out.astype(jnp.float32)


def windowed_gather(fm_flat: Array, idx: Array, w: Array,
                    sample_block: int = SAMPLE_BLOCK, band: int = BAND,
                    max_bands: int = MAX_BANDS) -> Array:
    """(HW, C) table + (M, 4) folded corners/weights -> (M, C) f32.

    Fast when ``idx`` rows are sorted/coherent; exact for any input (out-of-
    window corners are fixed up by a residual take pass inside lax.cond).
    """
    HW, C = fm_flat.shape
    M = idx.shape[0]
    BP = min(band, HW)
    # pad the table to a whole number of bands (bands index the row axis)
    hw_pad = (-HW) % BP
    if hw_pad:
        fm_flat = jnp.pad(fm_flat, ((0, hw_pad), (0, 0)))
        HW += hw_pad
    n_bands = HW // BP
    J = min(max_bands, n_bands)
    S = sample_block
    pad = (-M) % S
    if pad:
        # edge-pad indices: zero-padding would drag the last block's row
        # window to band 0 and trigger the residual pass on every call
        idx = jnp.pad(idx, ((0, pad), (0, 0)), mode='edge')
        w = jnp.pad(w, ((0, pad), (0, 0)))
    n_blocks = (M + pad) // S

    bands_c = idx // BP                                    # (M', 4)
    blk = bands_c.reshape(n_blocks, S * 4)
    lo = jnp.min(blk, axis=1)
    hi = jnp.max(blk, axis=1)
    start = jnp.clip(jnp.minimum(lo, hi - (J - 1)), 0,
                     n_bands - J).astype(jnp.int32)
    hits = jnp.clip(hi - start + 1, 1, J).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks, J),
        in_specs=[
            pl.BlockSpec((S, 4), lambda i, j, s, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 4), lambda i, j, s, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BP, C),
                lambda i, j, s, h: (s[i] + jnp.minimum(j, h[i] - 1), 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, C), lambda i, j, s, h: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _windowed_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M + pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(start, hits, idx, w.astype(jnp.float32), fm_flat.astype(jnp.bfloat16))
    out = out[:M]

    # Residual: corners outside their block's window (rare — only when a
    # block's row span exceeds max_bands * band positions).
    win_lo = jnp.repeat(start, S)[:M, None]
    outside = (bands_c[:M] < win_lo) | (bands_c[:M] >= win_lo + J)
    w_resid = jnp.where(outside, w[:M], 0.0)
    has_resid = jnp.any(w_resid != 0)

    def with_resid(o):
        return o + _take_gather(fm_flat, idx[:M], w_resid)

    return jax.lax.cond(has_resid, with_resid, lambda o: o, out)


def _gs_forward(fm: Array, coords: Array, image_id: Array,
                padding_mode: str) -> Array:
    B, H, W, C = fm.shape
    idx, w = _corners_flat(H, W, jnp.float32, coords, image_id, padding_mode)
    fm_flat = fm.reshape(B * H * W, C)
    if _on_tpu():
        out = resident_gather(fm_flat, idx, w)
    else:
        out = _take_gather(fm_flat, idx, w)
    return out.astype(fm.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def grid_sample_sorted(fm: Array, coords: Array, image_id: Array,
                       padding_mode: str = 'border') -> Array:
    """Bilinear sample a (B, H, W, C) map at a flat sorted stream.

    Args:
      fm: (B, H, W, C) feature maps.
      coords: (M, 2) ndc coords (torch grid_sample convention,
        align_corners=False), ideally row-sorted (see :func:`sort_stream`).
      image_id: (M,) int32 image index per sample.
      padding_mode: 'border' or 'zeros'.

    Returns:
      (M, C) samples, dtype of ``fm``.
    """
    return _gs_forward(fm, coords, image_id, padding_mode)


def _gs_fwd(fm, coords, image_id, padding_mode):
    return _gs_forward(fm, coords, image_id, padding_mode), (fm, coords,
                                                             image_id)


def _gs_bwd(padding_mode, res, g):
    fm, coords, image_id = res

    def ref(fm_, coords_):
        B, H, W, C = fm_.shape
        idx, w = _corners_flat(H, W, coords_.dtype, coords_, image_id,
                               padding_mode)
        return _take_gather(fm_.reshape(B * H * W, C), idx,
                            w).astype(fm_.dtype).reshape(g.shape)

    _, vjp = jax.vjp(ref, fm, coords)
    dfm, dcoords = vjp(g)
    return dfm, dcoords, None


grid_sample_sorted.defvjp(_gs_fwd, _gs_bwd)


def grid_sample_pyramid_sorted(pyramid: tuple[Array, ...],
                               stream: SortedStream,
                               padding_mode: str = 'border') -> Array:
    """Sample every pyramid level at a sorted stream; concat channels.

    Returns (M, sum(Ci)) in SORTED order (use :func:`unsort` to restore)."""
    return jnp.concatenate(
        [grid_sample_sorted(fm, stream.coords, stream.image_id,
                            padding_mode) for fm in pyramid], axis=-1)
