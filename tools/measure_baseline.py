"""Measure the reference renderer's throughput on this host's CPU.

The reference repo publishes no GPU numbers (BASELINE.md), and this
environment has no NVIDIA GPU, so the bench's ``vs_baseline`` constant is an
estimate. This tool anchors it with the one apples-to-apples measurement the
environment allows: the reference torch forward and our JAX forward on the
SAME silicon (host CPU), at the exact bench protocol (encoder latent cached,
renderer driven over ray chunks at 256² with npoints=64, 2 views).

Usage:
  JAX_PLATFORMS=cpu python tools/measure_baseline.py [--rays 2048] [--reps 3]

Prints one JSON line:
  {"torch_cpu_rays_per_sec": ..., "jax_cpu_rays_per_sec": ...,
   "same_silicon_ratio": ...}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_torch(scene, z, rays, reps, npoints):
    import torch
    from tools.make_renderer_golden import build_reference_model
    model = build_reference_model(n_view=2, npoints=npoints)
    model.H = model.W = 256
    tin = {
        'context': {k: torch.from_numpy(v.copy())
                    for k, v in scene['context'].items()},
        'query': {k: torch.from_numpy(v.copy())
                  for k, v in scene['query'].items()},
    }
    tz = [torch.from_numpy(np.moveaxis(np.asarray(a), -1, 1).copy())
          for a in z]
    with torch.no_grad():
        model(tin, z=tz)  # warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            out = model(tin, z=tz)
        dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(out['rgb'].numpy()).all()
    return rays / dt


def measure_jax(scene, z, params, model, rays, reps):
    import jax
    fwd = jax.jit(lambda p, s, zz: model.apply(p, s, z=zz)['rgb'])
    sj = jax.tree.map(np.asarray, scene)
    out = fwd(params, sj, z)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(params, sj, z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return rays / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rays', type=int, default=2048)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--npoints', type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from cross_attention_renderer_tpu.data import make_scene
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer

    H = W = 256
    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=args.rays)
    scene = jax.tree.map(lambda x: np.asarray(x, np.float32), scene)
    scene['query'].pop('rgb', None)
    scene['query'].pop('mask', None)

    rng = np.random.default_rng(0)
    z = [rng.normal(0, 1, (2, H // 4, W // 4, 256)).astype(np.float32),
         rng.normal(0, 1, (2, H // 2, W // 2, 256)).astype(np.float32),
         rng.normal(0, 1, (2, H, W, 64)).astype(np.float32)]

    model = CrossAttentionRenderer(n_view=2, npoints=args.npoints)
    zj = tuple(jnp.asarray(a) for a in z)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene, z=zj)
    jax_rps = measure_jax(scene, zj, params, model, args.rays, args.reps)
    torch_rps = measure_torch(scene, z, args.rays, args.reps, args.npoints)

    print(json.dumps({
        'torch_cpu_rays_per_sec': round(torch_rps, 1),
        'jax_cpu_rays_per_sec': round(jax_rps, 1),
        'same_silicon_ratio': round(jax_rps / torch_rps, 3),
        'rays': args.rays, 'npoints': args.npoints,
    }))


if __name__ == '__main__':
    main()
