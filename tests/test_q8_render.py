"""int8 gather-table fast-eval mode: the per-channel scale fold must make
the q8 renderer equal a dense render on explicitly-dequantized features
(the quantization ERROR is then exactly the PSNR cost measured by
tools/eval_pruned.py). Tiny config, CPU.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import (
    make_fast_renderer, make_scan_renderer)

TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
            resnet_layers=(1, 1, 1))


def setup_scene(H=32):
    scene = make_scene(13, batch=1, n_view=2, H=H, W=H, n_rays=H * H,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    params = model.init(jax.random.PRNGKey(0), scene)
    z = model.apply(params, scene, method='encode')
    return model, params, scene, z


def dequant_reference(z_l):
    """Replicates quantize_pyramid's math, returning q * s (float)."""
    x = np.asarray(z_l, np.float32)
    s = np.abs(x).max(axis=tuple(range(x.ndim - 1))) / 127.0
    s = np.maximum(s, 1e-8)
    q = np.clip(np.round(x / s), -127, 127)
    return jnp.asarray(q * s, jnp.float32)


def test_q8_equals_dense_on_dequantized_features():
    model, params, scene, z = setup_scene()
    uv = scene['query']['uv']
    dense = make_scan_renderer(model, 4)
    q8 = make_fast_renderer(model, 4, q8=True)

    z_deq = tuple(dequant_reference(z_l) for z_l in z)
    rgb_ref, valid_ref = dense(params, scene, z_deq, uv)
    rgb_q8, valid_q8 = q8(params, scene, z, uv)

    np.testing.assert_array_equal(np.asarray(valid_q8),
                                  np.asarray(valid_ref))
    np.testing.assert_allclose(np.asarray(rgb_q8), np.asarray(rgb_ref),
                               atol=2e-4)


def test_q8_quantization_error_is_small():
    model, params, scene, z = setup_scene()
    uv = scene['query']['uv']
    dense = make_scan_renderer(model, 4)
    q8 = make_fast_renderer(model, 4, q8=True)
    rgb_d, _ = dense(params, scene, z, uv)
    rgb_q, _ = q8(params, scene, z, uv)
    diff = float(jnp.abs(rgb_q - rgb_d).mean())
    scale = float(jnp.abs(rgb_d).mean()) + 1e-6
    assert diff / scale < 0.05, (diff, scale)


def test_all_three_levers_compose():
    model, params, scene, z = setup_scene()
    uv = scene['query']['uv']
    fast = make_fast_renderer(model, 4, pruned=(8, 8), narrow=(16, 16, 64),
                              q8=True)
    rgb, valid = fast(params, scene, z, uv)
    assert rgb.shape == (1, 1, uv.shape[2], 3)
    assert bool(jnp.isfinite(rgb).all())


@pytest.mark.slow
def test_q8_equals_dense_on_dequantized_features_v3():
    """The scale fold is V-generic (shared fuse layer); at V=3 the q8
    renderer must equal the dense render on dequantized features through
    BOTH the epipolar and the cross-view exchange gathers."""
    H = 32
    scene = make_scene(14, batch=1, n_view=3, H=H, W=H, n_rays=H * H,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=3, npoints=6, **TINY)
    params = model.init(jax.random.PRNGKey(3), scene)
    z = model.apply(params, scene, method='encode')
    uv = scene['query']['uv']
    dense = make_scan_renderer(model, 4)
    q8 = make_fast_renderer(model, 4, q8=True)

    z_deq = tuple(dequant_reference(z_l) for z_l in z)
    rgb_ref, valid_ref = dense(params, scene, z_deq, uv)
    rgb_q8, valid_q8 = q8(params, scene, z, uv)
    np.testing.assert_array_equal(np.asarray(valid_q8),
                                  np.asarray(valid_ref))
    np.testing.assert_allclose(np.asarray(rgb_q8), np.asarray(rgb_ref),
                               atol=2e-4)
