"""Bisect which construct the Mosaic compiler rejects in micro_kgather."""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 512
HW, C4 = 8192, 1024
M = BM * 4


def try_case(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f'{name}: OK', flush=True)
        return True
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:200]}',
              flush=True)
        return False


def smem_block_input():
    # SMEM-space regular input, 1-D block
    def kernel(idx_ref, out_ref):
        out_ref[:] = jnp.full_like(out_ref, idx_ref[0])

    idx = jnp.arange(M, dtype=jnp.int32)
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM,), lambda i: (i,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((BM, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32),
    )(idx)


def dyn_row_load_f32():
    # dynamic single-row load from resident f32 table, static store
    T = jnp.ones((HW, 256), jnp.float32)

    def kernel(idx_ref, t_ref, out_ref):
        def body(j, _):
            r = idx_ref[j]
            out_ref[pl.ds(j, 1), :] = t_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BM, body, 0)

    idx = jnp.arange(M, dtype=jnp.int32) % HW
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((HW, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 256), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, T)


def dyn_row_load_bf16():
    T = jnp.ones((HW, C4), jnp.bfloat16)

    def kernel(idx_ref, t_ref, out_ref):
        def body(j, _):
            r = idx_ref[j]
            out_ref[pl.ds(j, 1), :] = t_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BM, body, 0)

    idx = jnp.arange(M, dtype=jnp.int32) % HW
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((HW, C4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, C4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C4), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, T)


def dyn_row_static_store_scratch():
    # load dynamic row into scratch row 0 (static), then copy
    T = jnp.ones((HW, 256), jnp.float32)

    def kernel(idx_ref, t_ref, out_ref, sc):
        def body(j, _):
            r = idx_ref[j]
            sc[:, :] = t_ref[pl.ds(r, 1), :]
            out_ref[pl.ds(j, 1), :] = sc[:, :]
            return 0
        jax.lax.fori_loop(0, BM, body, 0)

    idx = jnp.arange(M, dtype=jnp.int32) % HW
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((HW, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, T)


def dma_one_row():
    # one DMA per row HBM->VMEM out, single sem, serialized
    T = jnp.ones((HW, 256), jnp.float32)

    def kernel(idx_ref, t_hbm, out_ref, sem):
        def body(j, _):
            r = idx_ref[j]
            cp = pltpu.make_async_copy(t_hbm.at[pl.ds(r, 1), :],
                                       out_ref.at[pl.ds(j, 1), :], sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, BM, body, 0)

    idx = jnp.arange(M, dtype=jnp.int32) % HW
    return pl.pallas_call(
        kernel, grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BM, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 256), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, T)


if __name__ == '__main__':
    cases = dict(smem=smem_block_input, f32=dyn_row_load_f32,
                 bf16=dyn_row_load_bf16,
                 scratch=dyn_row_static_store_scratch, dma=dma_one_row)
    names = sys.argv[1:] or list(cases)
    for n in names:
        try_case(n, cases[n])
