"""Quality + speed of the fast-eval renderers (pruned / narrow / both).

Loads params trained by ``tools/capability_run.py --save`` (medium config
on textured-plane worlds), renders UNSEEN worlds full-image five ways —
dense npoints grid, uniform at n_fine (the naive way to cut samples),
coarse-to-fine pruned, PCA-narrowed, and narrow+pruned — and reports PSNR
vs ground truth plus steady-state render time for each. The fast modes
only earn their keep if they hold the dense PSNR where plain
sample-cutting loses it.

Usage:
  python -m tools.capability_run --steps 6000 --dtype bf16 --save /tmp/cap.npz
  python -m tools.eval_pruned --params /tmp/cap.npz [--pruned 16,24] \
      [--narrow 64,64,64]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data.synthetic import (make_boxes_scene,
                                                          make_plane_scene)
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import (
    make_fast_renderer, make_pruned_renderer, make_scan_renderer)
from cross_attention_renderer_tpu.utils.params_io import load_params

H = W = 64


def psnr(pred, gt):
    mse = float(np.mean((np.asarray(pred, np.float32)
                         - np.asarray(gt, np.float32)) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-10))


def timed(render, params, scene, z, uv, iters=8):
    rgb, _ = render(params, scene, z, uv)
    float(jnp.asarray(rgb).sum())                  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        rgb, _ = render(params, scene, z, uv)
    float(jnp.asarray(rgb).sum())
    return rgb, (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--params', required=True)
    ap.add_argument('--pruned', default='16,24', metavar='C,F')
    ap.add_argument('--narrow', default='64,64,64', metavar='K1,K2,K3',
                    help='PCA-narrowed per-level widths (capability config '
                         'full widths: 128,128,64)')
    ap.add_argument('--worlds', type=int, default=4,
                    help='number of unseen eval worlds')
    ap.add_argument('--dtype', default='bf16', choices=['f32', 'bf16'])
    ap.add_argument('--n-chunks', type=int, default=4)
    ap.add_argument('--config', default='medium',
                    choices=['medium', 'tiny'],
                    help='must match the capability_run --config that '
                         'produced --params')
    ap.add_argument('--platform', default='auto', choices=['auto', 'cpu'])
    ap.add_argument('--world', default='plane', choices=['plane', 'boxes'],
                    help='must match the capability_run --world that '
                         'produced --params')
    args = ap.parse_args()
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    n_coarse, n_fine = (int(x) for x in args.pruned.split(','))

    from tools.capability_run import CONFIGS
    cfg = CONFIGS[args.config]
    params = load_params(args.params)
    model = CrossAttentionRenderer(
        n_view=2, **cfg,
        dtype=jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32)
    uniform_fine = model.clone(npoints=n_fine)

    widths = tuple(int(x) for x in args.narrow.split(','))
    renders = {
        'dense': make_scan_renderer(model, args.n_chunks),
        'uniform_fine': make_scan_renderer(uniform_fine, args.n_chunks),
        'pruned': make_pruned_renderer(model, args.n_chunks,
                                       n_coarse, n_fine),
        'narrow': make_fast_renderer(model, args.n_chunks, narrow=widths),
        'q8': make_fast_renderer(model, args.n_chunks, q8=True),
        'narrow+pruned': make_fast_renderer(
            model, args.n_chunks, pruned=(n_coarse, n_fine), narrow=widths),
        'all(n+p+q8)': make_fast_renderer(
            model, args.n_chunks, pruned=(n_coarse, n_fine), narrow=widths,
            q8=True),
    }
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))

    rows = {k: [] for k in renders}
    times = {k: [] for k in renders}
    maker = make_boxes_scene if args.world == 'boxes' else make_plane_scene
    for wi in range(args.worlds):
        scene = jax.tree.map(
            jnp.asarray,
            jax.tree.map(np.asarray,
                         maker(200000 + wi, n_view=2, H=H, W=W)))
        gt = scene['query']['rgb']
        uv = scene['query']['uv']
        z = encode(params, scene)
        for name, render in renders.items():
            rgb, dt = timed(render, params, scene, z, uv)
            rows[name].append(psnr(rgb, gt))
            times[name].append(dt)

    print(f'\n{args.config}: npoints={model.n_samples} dense | '
          f'uniform@{n_fine} | pruned {n_coarse}+{n_fine} | '
          f'narrow {args.narrow} ({args.worlds} unseen worlds, '
          f'{H}x{W}, dtype={args.dtype})')
    for name in rows:
        print(f'{name:>13}: psnr {np.mean(rows[name]):6.2f} dB  '
              f'render {1e3 * np.mean(times[name]):7.1f} ms/image  '
              f'({H * W / np.mean(times[name]):,.0f} rays/s)')


if __name__ == '__main__':
    main()
