"""TPU A/B: sorted-stream gather path vs standard path at flagship shapes.

Runs on the real chip (do NOT run under tests/conftest.py). Prints parity
stats and per-block render timings for both renderer configurations.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer

H = W = 256
RAY_BLOCK = 8192


def timed_render(model, params, scene, z, uv, n=4):
    def render_block(params, scene, z, uv):
        s = dict(scene)
        s['query'] = dict(scene['query'])
        s['query']['uv'] = uv
        return model.apply(params, s, z=z)['rgb']

    render = jax.jit(render_block)
    out = render(params, scene, z, uv)
    float(out.sum())  # compile + fetch
    t0 = time.perf_counter()
    for _ in range(n):
        out = render(params, scene, z, uv)
    checksum = float(out.sum())
    t1 = time.perf_counter()
    assert checksum == checksum
    return np.asarray(out), (t1 - t0) / n


def main():
    print('backend:', jax.default_backend(), jax.devices())
    scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H * W,
                       full_image=True)
    uv = scene['query']['uv'][:, :, :RAY_BLOCK]

    m_std = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16,
                                   sorted_stream=False)
    m_srt = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16,
                                   sorted_stream=True)
    m_f32 = CrossAttentionRenderer(n_view=2, sorted_stream=False)
    params = jax.jit(m_std.init)(jax.random.PRNGKey(0), scene)
    encode = jax.jit(lambda p, s: m_std.apply(p, s, method='encode'))
    z = jax.block_until_ready(encode(params, scene))

    out_std, t_std = timed_render(m_std, params, scene, z, uv)
    out_srt, t_srt = timed_render(m_srt, params, scene, z, uv)
    out_f32, t_f32 = timed_render(m_f32, params, scene, z, uv, n=2)

    print(f'std bf16: {t_std * 1e3:8.1f} ms/block  '
          f'{RAY_BLOCK / t_std:10.0f} rays/s')
    print(f'sorted:   {t_srt * 1e3:8.1f} ms/block  '
          f'{RAY_BLOCK / t_srt:10.0f} rays/s')
    print(f'std f32:  {t_f32 * 1e3:8.1f} ms/block  '
          f'{RAY_BLOCK / t_f32:10.0f} rays/s')

    f32 = out_f32.astype(np.float32)
    scale = np.abs(f32).mean()
    for name, o in (('std_bf16 vs f32', out_std),
                    ('sorted   vs f32', out_srt),
                    ('sorted   vs std_bf16', out_srt - out_std + f32)):
        d = np.abs(o.astype(np.float32) - f32)
        print(f'{name}: max={d.max():.3e} mean={d.mean():.3e} '
              f'(rgb scale {scale:.2f})')


if __name__ == '__main__':
    main()
