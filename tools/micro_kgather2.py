"""Measure the in-kernel per-row gather rate (scalar-prefetch indices).

Step 2 of the VERDICT-r4 in-kernel-gather experiment: the prefetch-style
kernel compiles (micro_kgather_bisect2). Questions:
  1. ns/row of the fori_loop dynamic-slice gather from a VMEM-resident
     table (vs ~6.6-9.5 ns/row for XLA's take on the same shapes, and
     the in-program 3.2 ns/row figure from BENCH_NOTES round 2).
  2. how big can the scalar-prefetch index array get (SMEM capacity)?
  3. does manual unrolling help?
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, fn, *args, n=8, rows=None):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    per_row = dt * 1e6 / (rows or 1)
    print(f'{name:52s} {dt:8.2f} ms   {per_row:6.2f} ns/row', flush=True)
    return dt


def gather_prefetch(table, idx, bm, unroll=1):
    M = idx.shape[0]
    HW, C4 = table.shape

    def kernel(idx_ref, t_ref, out_ref):
        i = pl.program_id(0)

        def body(j, _):
            for u in range(unroll):
                k = j * unroll + u
                r = idx_ref[i * bm + k]
                out_ref[pl.ds(k, 1), :] = t_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, bm // unroll, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((HW, C4), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, C4), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, C4), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(idx, table)


def main():
    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # SMEM capacity probe: how many prefetched int32 indices fit?
    for logm in (14, 16, 18, 20):
        M = 1 << logm
        T = jnp.ones((1024, 256), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, 1024, (M,)), jnp.int32)
        try:
            out = jax.jit(lambda t, i: gather_prefetch(t, i, 512))(T, idx)
            jax.block_until_ready(out)
            print(f'prefetch {M} idx ({M * 4 / 1024:.0f} KB): OK',
                  flush=True)
        except Exception as e:
            print(f'prefetch {M} idx ({M * 4 / 1024:.0f} KB): FAIL '
                  f'{type(e).__name__}: {str(e)[:120]}', flush=True)
            break

    # rate at the flagship level-1 shape (as big as SMEM allows)
    M = 1 << 16
    for HW, C4 in ((8192, 1024), (32768, 1024), (131072, 256)):
        T = jnp.asarray(rng.normal(0, 1, (HW, C4)).astype(jnp.bfloat16))
        idx = jnp.asarray(rng.integers(0, HW, (M,)), jnp.int32)

        # parity
        ref = np.asarray(T)[np.asarray(idx[:512])]
        out = np.asarray(jax.jit(
            lambda t, i: gather_prefetch(t, i, 512))(T, idx)[:512])
        assert np.array_equal(out, ref), 'mismatch'

        def take(t, i):
            return jnp.take(t, i, axis=0, mode='clip')

        bench(f'take        {HW}x{C4} M={M}', take, T, idx, rows=M)
        for bm in (512, 2048):
            for u in (1, 4, 8):
                bench(f'loop bm={bm} u={u} {HW}x{C4} M={M}',
                      lambda t, i, bm=bm, u=u: gather_prefetch(t, i, bm, u),
                      T, idx, rows=M)


if __name__ == '__main__':
    main()
