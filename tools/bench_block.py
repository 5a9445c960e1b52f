"""Quick e2e timing of one 8192-ray std-path render block on the TPU.

Usage: python -m tools.bench_block [sorted|std|take]
  std  — default auto path
  take — CAR_NO_PALLAS_GATHER=1 equivalent (set env before running)
"""

import sys
import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer

H = W = 256
RAY_BLOCK = 8192


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'std'
    sorted_stream = {'std': False, 'sorted': True}.get(mode, False)
    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H * W,
                       full_image=True)
    uv = scene['query']['uv'][:, :, :RAY_BLOCK]
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16,
                                   sorted_stream=sorted_stream)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
    z = jax.block_until_ready(encode(params, scene))

    def render_block(params, scene, z, uv):
        s = dict(scene)
        s['query'] = dict(scene['query'])
        s['query']['uv'] = uv
        return model.apply(params, s, z=z)['rgb']

    render = jax.jit(render_block)
    float(render(params, scene, z, uv).sum())
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        out = render(params, scene, z, uv)
    float(out.sum())
    dt = (time.perf_counter() - t0) / n
    print(f'{mode}: {dt * 1e3:.1f} ms/block  {RAY_BLOCK / dt:.0f} rays/s')


if __name__ == '__main__':
    main()
