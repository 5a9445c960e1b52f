"""Ray-block-size sweep for the dense parity path.

bench.py fixes RAY_BLOCK=8192 (the reference's trajectory chunk size,
render_realestate10k_traj.py:97). The roofline (BENCH_NOTES.md) says the
block is HBM-bound on the 2x9.7 GB take round-trip; block size moves the
take working set (4.85 GB at 4096 rays, 19.4 GB at 16384) and the
per-iteration fixed costs (attention aux, address math), so the optimum
is not obviously 8192. This sweeps n_chunks over the full 65,536-ray
image on the flagship model and prints ms/image + rays/s per point.

Usage: python -m tools.bench_blocks [--chunks 4,8,16,32]
"""
import argparse
import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import make_scan_renderer

H = W = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--chunks', default='4,8,16,32')
    ap.add_argument('--iters', type=int, default=4)
    args = ap.parse_args()

    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H * W,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    z = jax.block_until_ready(encode(params, scene))
    uv_full = scene['query']['uv']

    for n_chunks in (int(x) for x in args.chunks.split(',')):
        render = make_scan_renderer(model, n_chunks)
        float(render(params, scene, z, uv_full)[0].sum())  # compile+warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rgb, _ = render(params, scene, z, uv_full)
        checksum = float(rgb.sum())
        dt = (time.perf_counter() - t0) / args.iters
        assert checksum == checksum
        print(f'n_chunks={n_chunks:3d} block={H * W // n_chunks:6d} rays  '
              f'{dt * 1e3:7.1f} ms/image  {H * W / dt / 1e3:7.1f}k rays/s',
              flush=True)


if __name__ == '__main__':
    main()
