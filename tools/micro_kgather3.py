"""In-kernel gather, round 3: the two layouts Mosaic CAN compile.

micro_kgather2 established that arbitrary-offset single-row vector loads
from a VMEM table are rejected ("cannot statically prove that index in
dimension 0 is a multiple of 8") — the sublane dim of a 2-D memref only
takes aligned dynamic offsets. The remaining candidates:

  a) 3-D tile-row table (HW, 16, 128) bf16 — one full (16, 128) tile per
     packed row (2048 bf16 = an 8-slot 2x4 pair-window cell), dynamic
     index on the untiled dim 0. Measures the per-row rate of
     load-tile -> store-tile in a fori_loop.
  b) one DMA per row from an HBM table, scalar-prefetched indices,
     16-deep in-flight window — measures the DMA issue rate (the number
     VERDICT r4 asked to be recorded if it kills the idea).

Baseline: XLA take at the same shapes.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 16      # samples per call (index SMEM budget); rate extrapolates
BM = 512


def bench(name, fn, *args, n=8, rows=None):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out[:8, :8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(jnp.sum(out[:8, :8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    per_row = dt * 1e6 / (rows or 1)
    print(f'{name:52s} {dt:8.3f} ms   {per_row:6.2f} ns/row', flush=True)
    return dt


def tile_gather(table3, idx, unroll=1):
    """a) (HW, 16, 128) bf16 table; out (M, 16, 128)."""
    HW = table3.shape[0]

    def kernel(idx_ref, t_ref, out_ref):
        i = pl.program_id(0)

        def body(j, _):
            for u in range(unroll):
                k = j * unroll + u
                r = idx_ref[i * BM + k]
                out_ref[pl.ds(k, 1)] = t_ref[pl.ds(r, 1)]
            return 0
        jax.lax.fori_loop(0, BM // unroll, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((HW, 16, 128), lambda i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, 16, 128), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, 16, 128), table3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(idx, table3)


NSEM = 16


def dma_gather(table, idx):
    """b) HBM table (HW, C4); per-row DMA with NSEM-deep window."""
    HW, C4 = table.shape

    def kernel(idx_ref, t_hbm, out_ref, sems):
        i = pl.program_id(0)

        def mk(j):
            r = idx_ref[i * BM + j]
            return pltpu.make_async_copy(
                t_hbm.at[pl.ds(r, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j % NSEM])

        for j in range(NSEM):
            mk(j).start()

        def body_issue(j, _):
            mk(j).wait()
            mk(j + NSEM).start()
            return 0

        def body_drain(j, _):
            mk(j).wait()
            return 0

        jax.lax.fori_loop(0, BM - NSEM, body_issue, 0)
        jax.lax.fori_loop(BM - NSEM, BM, body_drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BM, C4), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, C4), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx, table)


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    HW = 16384                      # pair-window rows at the 128^2 level
    T3 = jnp.asarray(rng.normal(0, 1, (HW, 16, 128)).astype(jnp.bfloat16))
    T2 = T3.reshape(HW, 2048)
    idx = jnp.asarray(rng.integers(0, HW, (M,)), jnp.int32)

    def take(t, i):
        return jnp.take(t, i, axis=0, mode='clip')

    bench(f'take 2D {HW}x2048 (same bytes)', take, T2, idx, rows=M)

    # a) tile-row gather: parity then rate
    try:
        out = jax.jit(tile_gather)(T3, idx)
        ref = np.asarray(T3)[np.asarray(idx[:BM])]
        assert np.array_equal(np.asarray(out[:BM]), ref), 'tile mismatch'
        for u in (1, 4, 8):
            bench(f'tile-row loop u={u} ({HW},16,128)',
                  lambda t, i, u=u: tile_gather(t, i, u).reshape(M, 2048),
                  T3, idx, rows=M)
    except Exception as e:
        print(f'tile-row FAILED: {type(e).__name__}: {str(e)[:300]}',
              flush=True)

    # b) DMA-per-row issue rate
    try:
        Td = T2[:, :1024]
        out = jax.jit(dma_gather)(Td, idx)
        ref = np.asarray(Td)[np.asarray(idx[:BM])]
        assert np.array_equal(np.asarray(out[:BM]), ref), 'dma mismatch'
        bench(f'dma-per-row ({HW},1024) window={NSEM}', dma_gather, Td,
              idx, rows=M)
    except Exception as e:
        print(f'dma-per-row FAILED: {type(e).__name__}: {str(e)[:300]}',
              flush=True)


if __name__ == '__main__':
    main()
