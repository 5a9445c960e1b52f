"""V=3 render throughput at the reference's 3-view operating point.

The reference switches to npoints=48 when rendering with 3 context views
(models.py:47-54 picks the sample count by view count); this measures the
same protocol as bench.py (full flagship model, 256² image rendered in
jitted 8192-ray scan blocks, encoder latent cached) but with n_view=3 so
the exchange runs its three-way latent swap.

Usage: PYTHONPATH=. python tools/bench_v3.py [--iters 4]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import make_scan_renderer

H = W = 256
# 4096-ray blocks: the fused V=3 path's three gather streams are 1.5x the
# V=2 take volume per ray — 8192-ray blocks put ~16.3 GB of takes in
# flight and OOM the 16 GB HBM (the reference likewise halves its chunk
# size at 3 views, eval_realestate10k.py:144-149).
RAY_BLOCK = 4096
N_BLOCKS = (H * W) // RAY_BLOCK


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--blocks', type=int, default=N_BLOCKS)
    ap.add_argument('--npoints', type=int, default=0,
                    help='0 = reference default (48 at 3 views)')
    args = ap.parse_args()

    scene = make_scene(0, batch=1, n_view=3, H=H, W=W, n_rays=H * W,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=3, dtype=jnp.bfloat16,
                                   npoints=args.npoints)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    z = jax.block_until_ready(encode(params, scene))
    uv = scene['query']['uv']

    render = make_scan_renderer(model, args.blocks)
    t0 = time.perf_counter()
    float(jnp.asarray(render(params, scene, z, uv)[0]).sum())
    print(f'compile+first: {time.perf_counter() - t0:.1f} s '
          f'(backend={jax.default_backend()})')

    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = render(params, scene, z, uv)[0]
    float(jnp.asarray(out).sum())
    dt = (time.perf_counter() - t0) / args.iters
    rays = H * W
    print(f'V=3 full image: {dt * 1e3:.0f} ms  {rays / dt / 1e3:.1f}k rays/s '
          f'(npoints={model.n_samples})')


if __name__ == '__main__':
    main()
