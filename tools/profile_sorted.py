"""Per-component timings of the sorted-stream path on the real TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.ops.sorted_gather import (
    _corners_flat, _take_gather, windowed_gather, sort_stream)

M = 1 << 20  # flagship sample-stream size (2 views x 8192 rays x 64 pts)
B = 2


def fetch(tree):
    # the axon tunnel's block_until_ready is unreliable — always fetch
    return float(sum(jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree.leaves(tree)))


def bench(name, fn, *args, n=20):
    jfn = jax.jit(fn)
    fetch(jfn(*args))  # compile + settle
    # one fetch at the end: device work serializes, so the single host
    # round-trip amortizes over n dispatches
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = jfn(*args)  # previous buffer freed; device queue serializes
    fetch(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f'{name:42s} {dt:8.2f} ms')
    return dt


def main():
    print('backend:', jax.default_backend())
    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        rng.uniform(-1, 1, (B, M // B, 2)).astype(np.float32))
    key_hw = (256, 256)

    bench('sort_stream (argsort x2 + takes)',
          lambda c: sort_stream(c, key_hw), coords)

    stream = jax.jit(lambda c: sort_stream(c, key_hw))(coords)
    stream = jax.tree.map(jax.block_until_ready, stream)

    wide = jnp.asarray(rng.normal(0, 1, (M, 288)).astype(jnp.bfloat16))
    bench('unsort (M,288) bf16 take',
          lambda x, p: jnp.take(x, p, axis=0), wide, stream.inv_perm)
    narrow = jnp.asarray(rng.normal(0, 1, (M, 3)).astype(np.float32))
    bench('narrow (M,3) f32 take',
          lambda x, p: jnp.take(x, p, axis=0), narrow, stream.perm)

    for (H, W, C) in ((64, 64, 256), (128, 128, 256), (256, 256, 64)):
        fm = jnp.asarray(
            rng.normal(0, 1, (B * H * W, C)).astype(np.float32))
        idx, w = _corners_flat(H, W, jnp.float32, stream.coords,
                               stream.image_id, 'border')
        idx = jax.block_until_ready(idx)
        bench(f'windowed_gather {H}x{W}x{C}',
              lambda f, i, ww: windowed_gather(f, i, ww), fm, idx, w, n=6)
        bench(f'take_gather     {H}x{W}x{C} (bf16)',
              lambda f, i, ww: _take_gather(f.astype(jnp.bfloat16), i, ww),
              fm, idx, w, n=6)


if __name__ == '__main__':
    main()
