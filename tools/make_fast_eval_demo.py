"""Render the fast-eval comparison strip: GT | dense | uniform-cut | pruned.

Uses trained params from ``tools/capability_run.py --save`` on an UNSEEN
world (same harness as tools/eval_pruned.py) and writes one PNG strip plus
per-mode PSNR in the filename-adjacent stdout. The artifact documents the
discriminating boxes-world result (BENCH_NOTES.md "Fast-eval levers"):
guided pruning holds dense quality where the naive uniform cut visibly
loses it.

Usage:
  python tools/make_fast_eval_demo.py --params /tmp/tiny_boxes2k.npz \
      --config tiny --world boxes --platform cpu --out docs/fast_eval_boxes.png
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def psnr(pred, gt):
    mse = float(np.mean((np.asarray(pred, np.float32)
                         - np.asarray(gt, np.float32)) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--params', required=True)
    ap.add_argument('--config', default='tiny', choices=['medium', 'tiny'])
    ap.add_argument('--world', default='boxes', choices=['plane', 'boxes'])
    ap.add_argument('--seed', type=int, default=200001,
                    help='world seed (eval_pruned uses 200000+i)')
    ap.add_argument('--pruned', default=None, metavar='C,F',
                    help='default: npoints/2 coarse + npoints/2 fine')
    ap.add_argument('--out', default='docs/fast_eval_boxes.png')
    ap.add_argument('--platform', default='auto', choices=['auto', 'cpu'])
    args = ap.parse_args()
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    from cross_attention_renderer_tpu.data.synthetic import (
        make_boxes_scene, make_plane_scene)
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    from cross_attention_renderer_tpu.train.evaluation import (
        make_pruned_renderer, make_scan_renderer)
    from cross_attention_renderer_tpu.utils.params_io import load_params
    from tools.capability_run import CONFIGS, H, W

    params = load_params(args.params)
    model = CrossAttentionRenderer(n_view=2, **CONFIGS[args.config])
    P = model.n_samples
    nc, nf = ((int(x) for x in args.pruned.split(','))
              if args.pruned else (P // 2, P // 2))

    maker = make_boxes_scene if args.world == 'boxes' else make_plane_scene
    scene = jax.tree.map(jnp.asarray, jax.tree.map(
        np.asarray, maker(args.seed, n_view=2, H=H, W=W)))
    z = model.apply(params, scene, method='encode')
    uv = scene['query']['uv']
    gt = np.asarray(scene['query']['rgb'], np.float32).reshape(H, W, 3)

    renders = {
        f'dense@{P}': make_scan_renderer(model, 4),
        f'uniform@{nf}': make_scan_renderer(model.clone(npoints=nf), 4),
        f'pruned {nc}+{nf}': make_pruned_renderer(model, 4, nc, nf),
    }
    tiles = [gt]
    labels = ['ground truth']
    for name, render in renders.items():
        rgb, _ = render(params, scene, z, uv)
        img = np.asarray(rgb, np.float32).reshape(H, W, 3)
        tiles.append(img)
        labels.append(f'{name}: {psnr(img, gt):.2f} dB')
    print(' | '.join(labels))

    strip = np.concatenate(tiles, axis=1)
    strip8 = np.clip((strip + 1.0) * 127.5, 0, 255).astype(np.uint8)
    import imageio.v2 as imageio
    imageio.imwrite(args.out, strip8)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
