"""Micro: can a Pallas kernel gather random rows as fast as XLA's take?

The VERDICT-r4 in-kernel-gather experiment, step 1 of 2. The proposal:
keep the packed-cell tables resident (VMEM) or in HBM and gather each
block's rows INSIDE the fused epilogue kernel, so the (2M, 4C) take
output is never materialized in HBM (the 2x9.7 GB round-trip that the
round-3 roofline says binds the dense path at ~235k rays/s).

Whether that can win reduces to one number: the per-row cost of a
dynamic-index row fetch inside a Pallas TPU kernel, vs the ~3.2 ns/row
XLA's take achieves (BENCH_NOTES round 2). This micro measures, at the
flagship level-1 shape (32768 rows x 1024ch bf16 packed cells, 1M
samples):

  a) XLA take (the baseline to beat)
  b) Pallas VMEM-resident table, per-row fori_loop of dynamic slices
  c) b) manually unrolled x8 (helps Mosaic pipeline the loads)
  d) Pallas HBM-resident table, one async DMA per row, 16-deep
     in-flight window (measures the DMA-issue rate the VERDICT asked
     to be recorded if it kills the idea)

Run on the real chip: python tools/micro_kgather.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 20
BM = 512


def bench(name, fn, *args, n=8):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    per_row = dt * 1e6 / M
    print(f'{name:44s} {dt:8.2f} ms   {per_row:6.2f} ns/row', flush=True)
    return dt


# --------------------------------------------------------------------------
# b/c) VMEM-resident per-row loop
# --------------------------------------------------------------------------

def _loop_kernel(idx_ref, table_ref, out_ref, *, unroll: int):
    def body(j, _):
        for u in range(unroll):
            r = idx_ref[j * unroll + u]
            out_ref[pl.ds(j * unroll + u, 1), :] = table_ref[pl.ds(r, 1), :]
        return 0
    jax.lax.fori_loop(0, BM // unroll, body, 0)


def vmem_loop_gather(table, idx, unroll=1):
    HW, C4 = table.shape
    grid = (M // BM,)
    return pl.pallas_call(
        functools.partial(_loop_kernel, unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((HW, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, C4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C4), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(idx, table)


# --------------------------------------------------------------------------
# d) HBM table, DMA per row, 16-deep window
# --------------------------------------------------------------------------

NSEM = 16


def _dma_kernel(idx_ref, table_hbm, out_ref, sems):
    def start(j):
        r = idx_ref[j]
        pltpu.make_async_copy(
            table_hbm.at[pl.ds(r, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % NSEM]).start()

    def wait(j):
        r = idx_ref[j]
        pltpu.make_async_copy(
            table_hbm.at[pl.ds(r, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % NSEM]).wait()

    for j in range(NSEM):
        start(j)

    def body(j, _):
        wait(j)
        return 0

    def body_issue(j, _):
        wait(j)
        start(j + NSEM)
        return 0

    jax.lax.fori_loop(0, BM - NSEM, body_issue, 0)
    jax.lax.fori_loop(BM - NSEM, BM, body, 0)


def hbm_dma_gather(table, idx):
    HW, C4 = table.shape
    grid = (M // BM,)
    return pl.pallas_call(
        _dma_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BM, C4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C4), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx, table)


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    shapes = [(32768, 1024), (8192, 1024), (131072, 256)]
    for HW, C4 in shapes:
        print(f'--- table ({HW}, {C4}) bf16 = '
              f'{HW * C4 * 2 / 1e6:.1f} MB ---', flush=True)
        T = jnp.asarray(rng.normal(0, 1, (HW, C4)).astype(jnp.bfloat16))
        idx = jnp.asarray(rng.integers(0, HW, (M,)), jnp.int32)

        def take(t, i):
            return jnp.take(t, i, axis=0, mode='clip')

        bench(f'take {HW}x{C4}', take, T, idx)
        # parity first (tiny), then timing
        small = np.asarray(idx[:BM])
        try:
            out = np.asarray(jax.jit(
                lambda t, i: vmem_loop_gather(t, i))(T, idx)[:BM])
            ref = np.asarray(T)[small]
            assert np.array_equal(out, ref), 'vmem loop mismatch'
            bench(f'vmem loop u1 {HW}x{C4}',
                  lambda t, i: vmem_loop_gather(t, i, 1), T, idx)
            bench(f'vmem loop u8 {HW}x{C4}',
                  lambda t, i: vmem_loop_gather(t, i, 8), T, idx)
        except Exception as e:
            print(f'vmem loop FAILED: {type(e).__name__}: '
                  f'{str(e)[:300]}', flush=True)
        try:
            out = np.asarray(jax.jit(hbm_dma_gather)(T, idx)[:BM])
            ref = np.asarray(T)[small]
            assert np.array_equal(out, ref), 'dma gather mismatch'
            bench(f'hbm dma/row {HW}x{C4}', hbm_dma_gather, T, idx)
        except Exception as e:
            print(f'hbm dma FAILED: {type(e).__name__}: '
                  f'{str(e)[:300]}', flush=True)


if __name__ == '__main__':
    main()
