import os
import time
import jax, jax.numpy as jnp
from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import make_scan_renderer

H = W = 256; RB = 8192; NB = (H*W)//RB
scene = make_scene(0, batch=1, n_view=2, H=H, W=W, n_rays=H*W, full_image=True)
model = CrossAttentionRenderer(n_view=2, dtype=jnp.bfloat16)
params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
encode = jax.jit(lambda p, s: model.apply(p, s, method='encode'))
z = jax.block_until_ready(encode(params, scene))
uv_full = scene['query']['uv']

def timed(name, f, n=3):
    out = f(); float(out[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    float(out[0].sum())
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.1f} ms  ({H*W/dt/1e3:.1f}k rays/s)', flush=True)

render = make_scan_renderer(model, NB)
timed('staged (epilogue+attn)', lambda: render(params, scene, z, uv_full))

# scan unroll: k sub-blocks per iteration -> take/epilogue overlap across
# sub-blocks (the While-loop boundary forbids it across iterations)
for k in (2, 4):
    os.environ['CAR_SCAN_UNROLL'] = str(k)
    r = make_scan_renderer(model, NB)
    timed(f'staged unroll={k}      ', lambda r=r: r(params, scene, z, uv_full))
os.environ.pop('CAR_SCAN_UNROLL', None)

import cross_attention_renderer_tpu.ops.fused_render as FR
os.environ['CAR_FUSED_RENDER'] = '1'
for rays in (8, 16, 32):
    FR.RAY_BLOCK = rays
    r = make_scan_renderer(model, NB)
    # new jit each time (RAY_BLOCK is baked into the traced kernel)
    timed(f'mega rays={rays}       ', lambda r=r: r(params, scene, z, uv_full))

# best mega block size + unroll combined
os.environ['CAR_SCAN_UNROLL'] = '2'
for rays in (8, 16):
    FR.RAY_BLOCK = rays
    r = make_scan_renderer(model, NB)
    timed(f'mega rays={rays} unroll=2', lambda r=r: r(params, scene, z, uv_full))
