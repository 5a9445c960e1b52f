"""PCA narrow-features fast-eval mode: basis fold correctness + composition
with pruning (tiny config, CPU).

narrow_pyramid folds a per-scene PCA basis into the fuse kernel; on
exactly-rank-k features the truncation error is zero, so the narrow
renderer must reproduce the dense renderer bit-for-float. See
train/evaluation.py make_narrow_renderer.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import (
    make_narrow_renderer, make_scan_renderer)

TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
            resnet_layers=(1, 1, 1))


def setup_scene(H=32):
    scene = make_scene(9, batch=1, n_view=2, H=H, W=H, n_rays=H * H,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=2, npoints=8, **TINY)
    params = model.init(jax.random.PRNGKey(0), scene)
    z = model.apply(params, scene, method='encode')
    return model, params, scene, z


def to_rank(z_l, r):
    """Exact rank-r approximation of a feature level (host SVD)."""
    X = np.asarray(z_l, np.float64)
    C = X.shape[-1]
    flat = X.reshape(-1, C)
    U, S, Vt = np.linalg.svd(flat, full_matrices=False)
    lowr = (U[:, :r] * S[:r]) @ Vt[:r]
    return jnp.asarray(lowr.reshape(X.shape), jnp.float32)


def test_narrow_full_widths_is_identity():
    model, params, scene, z = setup_scene()
    widths = tuple(int(x.shape[-1]) for x in z)
    dense = make_scan_renderer(model, 4)
    narrow = make_narrow_renderer(model, 4, widths=widths)
    uv = scene['query']['uv']
    rgb_d, _ = dense(params, scene, z, uv)
    rgb_n, _ = narrow(params, scene, z, uv)
    np.testing.assert_array_equal(np.asarray(rgb_n), np.asarray(rgb_d))


def test_narrow_exact_on_lowrank_features():
    model, params, scene, z = setup_scene()
    r = 12                                       # < fusion_features (32)
    z_low = (to_rank(z[0], r), to_rank(z[1], r), z[2])
    widths = (r, r, int(z[2].shape[-1]))
    dense = make_scan_renderer(model, 4)
    narrow = make_narrow_renderer(model, 4, widths=widths)
    uv = scene['query']['uv']
    rgb_d, valid_d = dense(params, scene, z_low, uv)
    rgb_n, valid_n = narrow(params, scene, z_low, uv)
    np.testing.assert_array_equal(np.asarray(valid_n), np.asarray(valid_d))
    np.testing.assert_allclose(np.asarray(rgb_n), np.asarray(rgb_d),
                               atol=2e-3)


def test_narrow_truncation_is_graceful():
    model, params, scene, z = setup_scene()
    widths = (16, 16, int(z[2].shape[-1]))      # true truncation of rank-32
    dense = make_scan_renderer(model, 4)
    narrow = make_narrow_renderer(model, 4, widths=widths)
    uv = scene['query']['uv']
    rgb_d, _ = dense(params, scene, z, uv)
    rgb_n, _ = narrow(params, scene, z, uv)
    assert bool(jnp.isfinite(rgb_n).all())
    # random-init features have flat spectra (worst case for PCA); the
    # narrow render must still stay in the same output regime
    diff = float(jnp.abs(rgb_n - rgb_d).mean())
    scale = float(jnp.abs(rgb_d).mean()) + 1e-6
    assert diff / scale < 1.0, (diff, scale)


def test_narrow_composes_with_pruned():
    model, params, scene, z = setup_scene()
    r = 12
    z_low = (to_rank(z[0], r), to_rank(z[1], r), z[2])
    widths = (r, r, int(z[2].shape[-1]))
    uv = scene['query']['uv']
    both = make_narrow_renderer(model, 4, widths=widths, pruned=(8, 8))
    rgb, valid = both(params, scene, z_low, uv)
    assert rgb.shape == (1, 1, uv.shape[2], 3)
    assert bool(jnp.isfinite(rgb).all())


@pytest.mark.slow
def test_narrow_identity_v3():
    """The fold is V-generic: at V=3 the shared fuse layer is still the
    features' only consumer, so full-width narrowing must be exact."""
    H = 32
    scene = make_scene(11, batch=1, n_view=3, H=H, W=H, n_rays=H * H,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=3, npoints=6, **TINY)
    params = model.init(jax.random.PRNGKey(1), scene)
    z = model.apply(params, scene, method='encode')
    widths = tuple(int(x.shape[-1]) for x in z)
    dense = make_scan_renderer(model, 4)
    narrow = make_narrow_renderer(model, 4, widths=widths)
    uv = scene['query']['uv']
    rgb_d, _ = dense(params, scene, z, uv)
    rgb_n, _ = narrow(params, scene, z, uv)
    np.testing.assert_array_equal(np.asarray(rgb_n), np.asarray(rgb_d))


@pytest.mark.slow
def test_narrow_exact_on_lowrank_features_v3():
    H = 32
    scene = make_scene(12, batch=1, n_view=3, H=H, W=H, n_rays=H * H,
                       full_image=True)
    model = CrossAttentionRenderer(n_view=3, npoints=6, **TINY)
    params = model.init(jax.random.PRNGKey(2), scene)
    z = model.apply(params, scene, method='encode')
    r = 12
    z_low = (to_rank(z[0], r), to_rank(z[1], r), z[2])
    widths = (r, r, int(z[2].shape[-1]))
    dense = make_scan_renderer(model, 4)
    narrow = make_narrow_renderer(model, 4, widths=widths)
    uv = scene['query']['uv']
    rgb_d, valid_d = dense(params, scene, z_low, uv)
    rgb_n, valid_n = narrow(params, scene, z_low, uv)
    np.testing.assert_array_equal(np.asarray(valid_n), np.asarray(valid_d))
    np.testing.assert_allclose(np.asarray(rgb_n), np.asarray(rgb_d),
                               atol=2e-3)
