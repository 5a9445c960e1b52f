"""Bisect round 2: SMEM block shape variants + scalar prefetch."""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 512
HW = 8192
M = BM * 4


def try_case(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f'{name}: OK', flush=True)
        return True
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:160]}',
              flush=True)
        return False


def smem_2d():
    def kernel(idx_ref, out_ref):
        out_ref[:] = jnp.full_like(out_ref, idx_ref[0, 0])

    idx = jnp.arange(M, dtype=jnp.int32).reshape(M // BM, BM)
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((1, BM), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((BM, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32),
    )(idx)


def prefetch_idx():
    # whole idx array as scalar prefetch (SMEM), dynamic loads per row
    T = jnp.ones((HW, 256), jnp.float32)

    def kernel(idx_ref, t_ref, out_ref):
        i = pl.program_id(0)

        def body(j, _):
            r = idx_ref[i * BM + j]
            out_ref[pl.ds(j, 1), :] = t_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BM, body, 0)

    idx = jnp.arange(M, dtype=jnp.int32) % HW
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((HW, 256), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, 256), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, 256), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, T)


def vmem_idx_dma_smem():
    # idx block arrives in VMEM; kernel DMAs it to SMEM scratch, then
    # scalar-reads it for the dynamic row loads
    T = jnp.ones((HW, 256), jnp.float32)

    def kernel(idx_ref, t_ref, out_ref, sidx, sem):
        cp = pltpu.make_async_copy(idx_ref, sidx, sem)
        cp.start()
        cp.wait()

        def body(j, _):
            r = sidx[0, j]
            out_ref[pl.ds(j, 1), :] = t_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BM, body, 0)

    idx = (jnp.arange(M, dtype=jnp.int32) % HW).reshape(M // BM, BM)
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((1, BM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((HW, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 256), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, BM), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, T)


if __name__ == '__main__':
    cases = dict(smem2d=smem_2d, prefetch=prefetch_idx,
                 vmemdma=vmem_idx_dma_smem)
    names = sys.argv[1:] or list(cases)
    for n in names:
        try_case(n, cases[n])
