"""Micro: resident_gather (VMEM-resident table, 1 grid step/block) vs take.

Uses realistic sorted epipolar-like streams: 1M samples sorted by row.
Also checks numerical parity vs the take path.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.ops.sorted_gather import (
    _corners_flat, _take_gather, resident_gather, sort_stream)

M = 1 << 20
B = 2


def bench(name, fn, *args, n=8):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f'{name:40s} {dt:8.2f} ms')


def main():
    print('backend:', jax.default_backend())
    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        rng.uniform(-1.05, 1.05, (B, M // B, 2)).astype(np.float32))
    stream = jax.jit(lambda c: sort_stream(c, (256, 256)))(coords)
    stream = jax.tree.map(jax.block_until_ready, stream)

    for (H, W, C) in ((64, 64, 256), (128, 128, 256), (256, 256, 64)):
        fm = jnp.asarray(
            rng.normal(0, 1, (B * H * W, C)).astype(jnp.bfloat16))
        idx, w = _corners_flat(H, W, jnp.float32, stream.coords,
                               stream.image_id, 'border')
        idx = jax.block_until_ready(idx)

        ref = np.asarray(jax.jit(_take_gather)(fm, idx, w))
        out = np.asarray(jax.jit(resident_gather)(fm, idx, w))
        d = np.abs(out - ref)
        print(f'{H}x{W}x{C}: parity max={d.max():.3e} mean={d.mean():.3e}')

        bench(f'resident {H}x{W}x{C}', resident_gather, fm, idx, w)
        bench(f'take     {H}x{W}x{C}', _take_gather, fm, idx, w)


if __name__ == '__main__':
    main()
