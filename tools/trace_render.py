"""Capture a jax.profiler trace of one std-path render block on the TPU."""

import time

import jax
import jax.numpy as jnp

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer

H = W = 256
RAY_BLOCK = 8192


def main():
    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H * W,
                       full_image=True)
    uv = scene['query']['uv'][:, :, :RAY_BLOCK]
    model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16,
                                   sorted_stream=False)
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

    with jax.profiler.trace('/tmp/jax_trace'):
        for _ in range(3):
            out = render(params, scene, z, uv)
        float(out.sum())
    print('trace written')


if __name__ == '__main__':
    main()
