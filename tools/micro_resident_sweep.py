"""Sweep resident_gather (sample_block, window) on sorted epipolar streams.

Also prints the fraction of corners falling outside each block's window
(the residual-take trigger) so per-level windows can be chosen safely.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.ops.sorted_gather import (
    _corners_flat, resident_gather, sort_stream)

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
    print(f'{name:44s} {dt:8.2f} ms')


def outside_frac(idx, S, W):
    Mn = idx.shape[0]
    pad = (-Mn) % S
    idxp = np.pad(idx, ((0, pad), (0, 0)), mode='edge')
    blk = idxp.reshape(-1, S * 4)
    lo = (blk.min(1) // 256) * 256
    out = (idxp < lo.repeat(S)[:, None]) | (
        idxp >= (lo + W).repeat(S)[:, None])
    return out[:Mn].mean()


def main():
    print('backend:', jax.default_backend())
    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        rng.uniform(-1.05, 1.05, (B, M // B, 2)).astype(np.float32))
    stream = jax.jit(lambda c: sort_stream(c, (256, 256)))(coords)
    stream = jax.tree.map(jax.block_until_ready, stream)

    for (H, W_, C) in ((64, 64, 256), (128, 128, 256), (256, 256, 64)):
        fm = jnp.asarray(
            rng.normal(0, 1, (B * H * W_, C)).astype(jnp.bfloat16))
        idx, w = _corners_flat(H, W_, jnp.float32, stream.coords,
                               stream.image_id, 'border')
        idx_np = np.asarray(idx)
        for S, W in ((2048, 512), (2048, 256), (4096, 512), (1024, 256),
                     (4096, 1024), (8192, 1024)):
            if W > B * H * W_:
                continue
            frac = outside_frac(idx_np, S, W)
            bench(f'{H}x{W_}x{C} S={S} W={W} resid={frac:.4f}',
                  lambda f, i, ww, S=S, W=W: resident_gather(
                      f, i, ww, sample_block=S, window=W), fm, idx, w)


if __name__ == '__main__':
    main()
