"""Coarse-to-fine pruned-eval path: t_vals plumbing, the stratified
inverse-CDF resampler, and the two-pass pruned renderer (tiny config, CPU).

The pruned renderer is the documented fast-eval mode (BENCH_NOTES.md
roofline lever 1); its outputs deliberately differ from the uniform-64
reference protocol, so these tests pin the mechanism, not bit-parity.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer
from cross_attention_renderer_tpu.train.evaluation import (
    make_pruned_renderer, make_scan_renderer, resample_epipolar_t)

TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
            resnet_layers=(1, 1, 1))


def build(n_view=2, n_rays=16, **kw):
    cfg = dict(TINY)
    cfg.update(kw)
    scene = make_scene(n_view, batch=1, n_view=n_view, H=64, W=64,
                       n_rays=n_rays)
    model = CrossAttentionRenderer(n_view=n_view, npoints=8, **cfg)
    params = model.init(jax.random.PRNGKey(0), scene)
    return model, params, scene


# ---------------------------------------------------------------------------
# resample_epipolar_t
# ---------------------------------------------------------------------------

def test_resample_uniform_weights_is_stratified_uniform():
    Pc, Pf = 16, 24
    w = jnp.full((2, 2, 5, Pc), 1.0 / (2 * Pc))    # joint-normalized uniform
    t = resample_epipolar_t(w, Pf, floor=0.1)
    assert t.shape == (2, 2, 5, Pf)
    want = (np.arange(Pf) + 0.5) / Pf
    np.testing.assert_allclose(np.asarray(t[0, 0, 0]), want, atol=1e-5)
    # sorted, in range
    tt = np.asarray(t)
    assert (np.diff(tt, axis=-1) >= 0).all()
    assert tt.min() >= 0.0 and tt.max() <= 1.0


def test_resample_concentrates_on_peaked_weights():
    Pc, Pf = 16, 32
    peak = 10
    w = np.full((1, 1, 1, Pc), 1e-6, np.float32)
    w[..., peak] = 1.0
    t = np.asarray(resample_epipolar_t(jnp.asarray(w), Pf, floor=0.1))[0, 0, 0]
    # the peak bin is centered at t=peak/(Pc-1) with half-width 1/(2(Pc-1));
    # 90% of the mass lives there, so >= 80% of the strata must land inside
    center = peak / (Pc - 1)
    half = 0.5 / (Pc - 1)
    inside = np.mean(np.abs(t - center) <= half + 1e-6)
    assert inside >= 0.8, (inside, t)
    # the 10% uniform floor still covers the rest of the segment
    assert t.min() < 0.2 and t.max() > 0.8


def test_resample_floor_zero_degenerate_weights_stay_finite():
    # all-zero weights (fully invalid view): renormalization guard + floor
    w = jnp.zeros((1, 2, 3, 8))
    t = np.asarray(resample_epipolar_t(w, 16, floor=0.1))
    assert np.isfinite(t).all()
    assert (t >= 0.0).all() and (t <= 1.0).all()


# ---------------------------------------------------------------------------
# t_vals plumbing
# ---------------------------------------------------------------------------

def test_explicit_uniform_t_vals_match_default_path():
    model, params, scene = build()
    P = model.n_samples
    R = scene['query']['uv'].shape[2]
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, P), (1, 2, R, P))
    out_default = model.apply(params, scene)
    out_t = model.apply(params, scene, t_vals=t)
    np.testing.assert_allclose(np.asarray(out_t['rgb']),
                               np.asarray(out_default['rgb']),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_t['at_wt']),
                               np.asarray(out_default['at_wt']),
                               atol=1e-6)


def test_t_vals_overrides_sample_count():
    model, params, scene = build()
    R = scene['query']['uv'].shape[2]
    Pf = 12                                         # != model.n_samples (8)
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, Pf), (1, 2, R, Pf))
    out = model.apply(params, scene, t_vals=t)
    assert out['at_wt'].shape == (1, 2, R, Pf)
    assert out['pixel_val'].shape == (1, 2, R, Pf, 2)
    assert bool(jnp.isfinite(out['rgb']).all())


# ---------------------------------------------------------------------------
# pruned renderer
# ---------------------------------------------------------------------------

def test_pruned_renderer_floor_one_equals_direct_t_vals():
    # floor=1.0 makes the resampler weight-independent (pure uniform-in-t
    # strata), so the pruned renderer must EXACTLY equal a direct render at
    # those midpoint t_vals — pins the whole two-pass plumbing.
    n_view, H = 2, 32
    scene = make_scene(7, batch=1, n_view=n_view, H=H, W=H,
                       n_rays=H * H, full_image=True)
    model = CrossAttentionRenderer(n_view=n_view, npoints=8, **TINY)
    params = model.init(jax.random.PRNGKey(0), scene)
    z = model.apply(params, scene, method='encode')
    uv = scene['query']['uv']
    n_fine = 8

    pruned = make_pruned_renderer(model, n_chunks=4, n_coarse=8,
                                  n_fine=n_fine, floor=1.0)
    rgb_p, valid_p = pruned(params, scene, z, uv)

    t_mid = jnp.broadcast_to(
        (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine,
        (1, n_view, H * H, n_fine))
    out = model.apply(params, scene, z=z, t_vals=t_mid)
    np.testing.assert_allclose(np.asarray(rgb_p),
                               np.asarray(out['rgb']), atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(valid_p).reshape(-1),
        np.asarray(out['valid_mask']).reshape(-1))


def test_params_io_roundtrip(tmp_path):
    from cross_attention_renderer_tpu.utils.params_io import (
        load_params, save_params)
    model, params, scene = build(n_rays=8)
    path = str(tmp_path / 'p.npz')
    save_params(path, params)
    loaded = load_params(path)
    a = model.apply(params, scene)['rgb']
    b = model.apply(loaded, scene)['rgb']
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pruned_renderer_guided_smoke():
    n_view, H = 2, 32
    scene = make_scene(3, batch=1, n_view=n_view, H=H, W=H,
                       n_rays=H * H, full_image=True)
    model = CrossAttentionRenderer(n_view=n_view, npoints=8, **TINY)
    params = model.init(jax.random.PRNGKey(0), scene)
    z = model.apply(params, scene, method='encode')
    uv = scene['query']['uv']

    dense = make_scan_renderer(model, n_chunks=4)
    pruned = make_pruned_renderer(model, n_chunks=4, n_coarse=8, n_fine=8)
    rgb_d, valid_d = dense(params, scene, z, uv)
    rgb_p, valid_p = pruned(params, scene, z, uv)
    assert rgb_p.shape == rgb_d.shape
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_d))
    assert bool(jnp.isfinite(rgb_p).all())


@pytest.mark.slow
def test_pruned_renderer_guided_smoke_v3():
    """The coarse->fine resampler is V-generic; drive it end-to-end on the
    3-view renderer (uniform@coarse pass + guided fine pass, full image)."""
    n_view, H = 3, 32
    scene = make_scene(4, batch=1, n_view=n_view, H=H, W=H,
                       n_rays=H * H, full_image=True)
    model = CrossAttentionRenderer(n_view=n_view, npoints=6, **TINY)
    params = model.init(jax.random.PRNGKey(0), scene)
    z = model.apply(params, scene, method='encode')
    uv = scene['query']['uv']

    dense = make_scan_renderer(model, n_chunks=4)
    pruned = make_pruned_renderer(model, n_chunks=4, n_coarse=4, n_fine=6)
    rgb_d, valid_d = dense(params, scene, z, uv)
    rgb_p, valid_p = pruned(params, scene, z, uv)
    assert rgb_p.shape == rgb_d.shape
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_d))
    assert bool(jnp.isfinite(rgb_p).all())
