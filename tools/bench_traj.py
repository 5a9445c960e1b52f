"""Trajectory-render throughput: full 256² frames/sec with cached latent.

Mirrors render_realestate10k_traj.py:84-185 — encoder latent computed once
per scene, every frame rendered in 8192-ray chunks from a new query pose.
``--fast`` (or individual --pruned/--narrow/--q8) measures the fast-eval
composed renderer instead (docs/FAST_EVAL.md).
"""

import argparse
import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer

H = W = 256
RAY_BLOCK = 8192
FRAMES = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--fast', action='store_true')
    ap.add_argument('--pruned', default=None, metavar='C,F')
    ap.add_argument('--narrow', default=None, metavar='K1,K2,K3')
    ap.add_argument('--q8', action='store_true')
    args = ap.parse_args()
    pruned = (tuple(int(x) for x in args.pruned.split(','))
              if args.pruned else ((8, 16) if args.fast else None))
    narrow = (tuple(int(x) for x in args.narrow.split(','))
              if args.narrow else ((128, 128, 64) if args.fast else None))
    q8 = args.q8 or args.fast

    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H * W,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    z = encode(params, scene)

    from cross_attention_renderer_tpu.train.evaluation import (
        make_fast_renderer, make_scan_renderer)
    if pruned or narrow or q8:
        render_image = make_fast_renderer(model, (H * W) // RAY_BLOCK,
                                          pruned=pruned, narrow=narrow,
                                          q8=q8)
        print(f'fast mode: pruned={pruned} narrow={narrow} q8={q8}')
    else:
        render_image = make_scan_renderer(model, (H * W) // RAY_BLOCK)
    uv_full = scene['query']['uv']
    c2w0 = scene['query']['cam2world']

    def frame(params, scene, z, c2w):
        s = dict(scene)
        s['query'] = dict(scene['query'])
        s['query']['cam2world'] = c2w
        return render_image(params, s, z, uv_full)[0]

    float(frame(params, scene, z, c2w0).sum())  # compile

    # Precompute the per-frame poses OUTSIDE the timed loop: an eager
    # .at[].add dispatched mid-loop through the tunnel stalls the device
    # pipeline (~+700 ms/frame measured).
    poses = [jax.block_until_ready(c2w0.at[:, :, :3, 3].add(0.01 * f))
             for f in range(FRAMES)]
    t0 = time.perf_counter()
    out = None
    for c2w in poses:
        out = frame(params, scene, z, c2w)
    float(out.sum())
    dt = (time.perf_counter() - t0) / FRAMES
    print(f'trajectory: {dt * 1e3:.0f} ms/frame  {1 / dt:.2f} frames/s '
          f'({H}x{W}, {RAY_BLOCK}-ray chunks, z cached)')


if __name__ == '__main__':
    main()
