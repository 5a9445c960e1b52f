"""Throughput of the fast-eval render modes at flagship shapes (real TPU).

Same protocol as bench.py (full 122M model, 256², 2 views, encoder latent
cached, steady state over several full-image renders) but reports a table
across the documented fast-eval levers (BENCH_NOTES.md roofline):

  dense           uniform npoints=64 (the parity protocol; bench.py's number)
  pruned C,F      coarse-to-fine attention-guided sampling
  narrow k1,k2,k3 per-scene PCA feature narrowing
  q8              int8 gather tables
  all             all three composed

Quality for each mode is measured separately on trained weights by
tools/eval_pruned.py (plane-world harness); this tool is throughput only
(random weights — gather/matmul cost does not depend on values).

Usage: python -m tools.bench_fast [--pruned 16,24] [--narrow 128,128,64]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import (
    make_fast_renderer, make_scan_renderer)

H = W = 256
RAY_BLOCK = 8192
N_BLOCKS = (H * W) // RAY_BLOCK


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pruned', default='16,24')
    ap.add_argument('--narrow', default='128,128,64')
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--modes', default='dense,pruned,narrow,q8,all')
    args = ap.parse_args()
    pruned = tuple(int(x) for x in args.pruned.split(','))
    narrow = tuple(int(x) for x in args.narrow.split(','))

    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H * W,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    z = jax.block_until_ready(encode(params, scene))
    uv = scene['query']['uv']

    builders = {
        'dense': lambda: make_scan_renderer(model, N_BLOCKS),
        'pruned': lambda: make_fast_renderer(model, N_BLOCKS,
                                             pruned=pruned),
        'narrow': lambda: make_fast_renderer(model, N_BLOCKS,
                                             narrow=narrow),
        'q8': lambda: make_fast_renderer(model, N_BLOCKS, q8=True),
        'all': lambda: make_fast_renderer(model, N_BLOCKS, pruned=pruned,
                                          narrow=narrow, q8=True),
        'nq8': lambda: make_fast_renderer(model, N_BLOCKS, narrow=narrow,
                                          q8=True),
    }

    print(f'flagship 256², bf16, pruned={pruned}, narrow={narrow} '
          f'(backend={jax.default_backend()})')
    for name in args.modes.split(','):
        render = builders[name]()
        t_c0 = time.perf_counter()
        float(jnp.asarray(render(params, scene, z, uv)[0]).sum())
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rgb, _ = render(params, scene, z, uv)
        checksum = float(jnp.asarray(rgb).sum())
        dt = (time.perf_counter() - t0) / args.iters
        assert checksum == checksum
        print(f'{name:>7}: {1e3 * dt:7.1f} ms/image  '
              f'{H * W / dt:10,.0f} rays/s  (first call {compile_s:.1f}s)',
              flush=True)


if __name__ == '__main__':
    main()
