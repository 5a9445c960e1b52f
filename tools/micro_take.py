"""Micro: is XLA take per-row-overhead-bound? Test corner-folded rows.

Compares, at 1M samples on the real TPU:
  a) 4 takes of C-wide bf16 rows (current _take_gather), unsorted + sorted
  b) 1 take of 4C-wide packed-corner rows, unsorted + sorted
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

M = 1 << 20


def bench(name, fn, *args, n=8):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f'{name:46s} {dt:8.2f} ms')


def main():
    print('backend:', jax.default_backend())
    rng = np.random.default_rng(0)
    for HW, C in ((8192, 256), (32768, 256), (131072, 64)):
        T = jnp.asarray(rng.normal(0, 1, (HW, C)).astype(jnp.bfloat16))
        T4 = jnp.asarray(rng.normal(0, 1, (HW, 4 * C)).astype(jnp.bfloat16))
        idx_u = jnp.asarray(rng.integers(0, HW - 2, (M, 4)), jnp.int32)
        idx_s = jnp.sort(idx_u, axis=0)
        w = jnp.asarray(rng.uniform(0, 1, (M, 4)).astype(np.float32))

        def take4(t, i, ww):
            out = None
            for c in range(4):
                g = jnp.take(t, i[:, c], axis=0) * ww[:, c:c + 1].astype(
                    t.dtype)
                out = g if out is None else out + g
            return out

        def take1(t4, i, ww):
            g = jnp.take(t4, i[:, 0], axis=0)
            gg = g.reshape(M, 4, -1) * ww[:, :, None].astype(t4.dtype)
            return gg.sum(axis=1)

        bench(f'{HW}x{C} 4-take unsorted', take4, T, idx_u, w)
        bench(f'{HW}x{C} 4-take sorted  ', take4, T, idx_s, w)
        bench(f'{HW}x{C} 1-take4C unsorted', take1, T4, idx_u, w)
        bench(f'{HW}x{C} 1-take4C sorted  ', take1, T4, idx_s, w)


if __name__ == '__main__':
    main()
