"""Ray-sharded rendering over the 'rays' mesh axis matches single-device."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.parallel import make_mesh
from cross_attention_renderer_tpu.train.evaluation import (
    make_chunk_renderer, make_sharded_renderer)

TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
            resnet_layers=(1, 1, 1))


@pytest.mark.slow
def test_ray_sharded_matches_single():
    mesh = make_mesh(data=1, model=1, rays=8)
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    scene = make_scene(0, batch=1, n_view=2, H=64, W=64, n_rays=256)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)

    encode, render_chunk = make_chunk_renderer(model, params)
    z = encode(scene)
    uv = scene['query']['uv']
    rgb_single, valid_single = render_chunk(scene, z, uv)

    sharded = make_sharded_renderer(model, params, mesh)
    rgb_sh, valid_sh = sharded(scene, z, uv)

    assert len(set(d.device for d in
                   rgb_sh.addressable_shards)) >= 1
    np.testing.assert_allclose(np.asarray(rgb_sh),
                               np.asarray(rgb_single), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid_sh),
                                  np.asarray(valid_single))


def test_scan_renderer_matches_chunked():
    """lax.scan whole-image renderer == Python chunk loop (tiny config)."""
    from cross_attention_renderer_tpu.data import make_scene
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    from cross_attention_renderer_tpu.train.evaluation import (
        make_chunk_renderer, make_scan_renderer, render_full_image)
    import jax, numpy as np

    scene = make_scene(3, batch=1, n_view=2, H=32, W=32, n_rays=32 * 32,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, npoints=8, fusion_features=32,
                                   vit_width=64, vit_depth=2, vit_heads=2,
                                   resnet_layers=(1, 1, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene)
    encode, render_chunk = make_chunk_renderer(model, params)
    z = encode(scene)
    uv = scene['query']['uv']
    rgb_c, valid_c = render_full_image(render_chunk, scene, z, uv, 4)
    render_image = make_scan_renderer(model, 4)
    rgb_s, valid_s = render_image(params, scene, z, uv)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_c),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(valid_s).reshape(-1),
        np.asarray(valid_c).reshape(-1), atol=1e-6)


@pytest.mark.slow
def test_scan_unroll_matches_default(monkeypatch):
    """CAR_SCAN_UNROLL=2 (two independent sub-blocks per scan iteration,
    for take/compute overlap on TPU) must be output-identical to the
    default scan renderer."""
    import os
    from cross_attention_renderer_tpu.train.evaluation import (
        make_scan_renderer)
    H = 32
    scene = make_scene(21, batch=1, n_view=2, H=H, W=H, n_rays=H * H,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    params = model.init(jax.random.PRNGKey(0), scene)
    z = model.apply(params, scene, method='encode')
    uv = scene['query']['uv']
    base = make_scan_renderer(model, 4)
    monkeypatch.setenv('CAR_SCAN_UNROLL', '2')
    unrolled = make_scan_renderer(model, 4)
    monkeypatch.setenv('CAR_SCAN_UNROLL', '3')   # does not divide 4 -> k=1
    fallback = make_scan_renderer(model, 4)
    rgb_b, valid_b = base(params, scene, z, uv)
    rgb_u, valid_u = unrolled(params, scene, z, uv)
    rgb_f, valid_f = fallback(params, scene, z, uv)
    np.testing.assert_array_equal(np.asarray(rgb_u), np.asarray(rgb_b))
    np.testing.assert_array_equal(np.asarray(valid_u), np.asarray(valid_b))
    np.testing.assert_array_equal(np.asarray(rgb_f), np.asarray(rgb_b))
