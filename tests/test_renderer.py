"""Renderer forward/backward behavior tests (tiny encoder config, CPU).

The tiny config keeps the full architecture (R50-V2 stem -> joint multiview
ViT -> DPT fusion -> epipolar cross-attention -> ResnetFC) with small widths
so grad compiles stay fast on the test CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer

TINY = dict(fusion_features=32, vit_width=64, vit_depth=2, vit_heads=2,
            resnet_layers=(1, 1, 1))


def build(n_view=2, **kw):
    cfg = dict(TINY)
    cfg.update(kw)
    scene = make_scene(n_view, batch=1, n_view=n_view, H=64, W=64, n_rays=16)
    model = CrossAttentionRenderer(n_view=n_view, npoints=8, **cfg)
    params = model.init(jax.random.PRNGKey(0), scene)
    return model, params, scene


@pytest.mark.parametrize(
    'n_view', [1, 2, pytest.param(3, marks=pytest.mark.slow)])
def test_forward_shapes_finite(n_view):
    model, params, scene = build(n_view)
    out = model.apply(params, scene)
    R = scene['query']['uv'].shape[2]
    assert out['rgb'].shape == (1, 1, R, 3)
    assert out['depth_ray'].shape == (1, R, 1)
    assert out['at_wt'].shape == (1, n_view, R, model.n_samples)
    assert bool(jnp.isfinite(out['rgb']).all())
    assert bool(jnp.isfinite(out['depth_ray']).all())
    # attention normalizes over the joint (view, sample) axis
    np.testing.assert_allclose(np.asarray(out['at_wt']).sum((1, 3)), 1.0,
                               atol=1e-5)


def test_z_cache_matches_fresh_encode():
    """Cached-z inference must bit-match the fused path (models.py:201-204)."""
    model, params, scene = build(2)
    out_full = model.apply(params, scene)
    z = model.apply(params, scene, method='encode')
    out_cached = model.apply(params, scene, z=z)
    np.testing.assert_array_equal(np.asarray(out_full['rgb']),
                                  np.asarray(out_cached['rgb']))


@pytest.mark.parametrize(
    'n_view', [pytest.param(1, marks=pytest.mark.slow), 2])
def test_grad_finite(n_view):
    model, params, scene = build(n_view)

    def loss(p):
        o = model.apply(p, scene)
        return jnp.abs(o['rgb'] - scene['query']['rgb']).mean()

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    gnorm = jnp.sqrt(sum(jnp.sum(x ** 2) for x in leaves))
    assert float(gnorm) > 0.0


def test_ablation_flags_run():
    for flag in ['no_sample', 'no_latent_concat', 'no_multiview',
                 'no_high_freq']:
        model, params, scene = build(2, **{flag: True})
        out = model.apply(params, scene)
        assert bool(jnp.isfinite(out['rgb']).all()), flag


def test_invalid_rays_are_white():
    """Rays that miss every context frustum must render white
    (models.py:615-617)."""
    model, params, scene = build(1)
    # Context camera at identity; query camera 5 units behind it, rotated
    # 180° about x so every query ray points along -z — no ray ever enters
    # the context frustum.
    # All query rays exactly along -z: the whole LINE misses the context
    # frustum, which is the reference's invalidity condition too — rays whose
    # backward extension crosses the image still count as valid phantom
    # segments in both implementations (epipolar.py:232-251).
    scene['context']['cam2world'] = jnp.eye(4)[None, None]
    qc = np.eye(4)
    qc[1, 1] = qc[2, 2] = -1.0
    qc[2, 3] = -5.0
    scene['query']['cam2world'] = jnp.asarray(qc)[None, None]
    scene['query']['uv'] = jnp.full_like(scene['query']['uv'], 32.0)
    out = model.apply(params, scene)
    valid = np.asarray(out['valid_mask'])[0, :, 0]
    rgb = np.asarray(out['rgb'])[0, 0]
    assert (valid == 0).any()
    np.testing.assert_allclose(rgb[valid == 0], 1.0, atol=1e-6)


@pytest.mark.parametrize(
    'n_view', [2, pytest.param(3, marks=pytest.mark.slow)])
def test_sorted_stream_matches_standard(n_view):
    """The sorted-sample-stream gather/exchange path is numerically
    equivalent to the standard path (same bilinear sums, permuted order)."""
    from cross_attention_renderer_tpu.data import make_scene
    scene = make_scene(11, batch=1, n_view=n_view, H=32, W=32, n_rays=48)
    kw = dict(n_view=n_view, npoints=8, fusion_features=32, vit_width=64,
              vit_depth=2, vit_heads=2, resnet_layers=(1, 1, 1))
    m_std = CrossAttentionRenderer(sorted_stream=False, **kw)
    m_srt = CrossAttentionRenderer(sorted_stream=True, **kw)
    params = m_std.init(jax.random.PRNGKey(0), scene)
    out_std = m_std.apply(params, scene)
    out_srt = m_srt.apply(params, scene)
    for k in ('rgb', 'depth_ray', 'at_wt', 'valid_mask'):
        np.testing.assert_allclose(np.asarray(out_srt[k]),
                                   np.asarray(out_std[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_sorted_stream_gradients_match():
    """Gradients flow through the sorted path (custom VJPs + permutes) and
    match the standard path."""
    from cross_attention_renderer_tpu.data import make_scene
    scene = make_scene(5, batch=1, n_view=2, H=32, W=32, n_rays=16)
    kw = dict(n_view=2, npoints=8, fusion_features=32, vit_width=64,
              vit_depth=2, vit_heads=2, resnet_layers=(1, 1, 1))
    m_std = CrossAttentionRenderer(sorted_stream=False, **kw)
    m_srt = CrossAttentionRenderer(sorted_stream=True, **kw)
    params = m_std.init(jax.random.PRNGKey(0), scene)

    def loss(model, p):
        return jnp.mean(model.apply(p, scene)['rgb'] ** 2)

    g_std = jax.grad(lambda p: loss(m_std, p))(params)
    g_srt = jax.grad(lambda p: loss(m_srt, p))(params)
    flat_std = jax.tree.leaves(g_std)
    flat_srt = jax.tree.leaves(g_srt)
    for a, b in zip(flat_std, flat_srt):
        # atol absorbs permuted-reduction summation-order noise on
        # near-zero entries (observed max ~3e-5 on f32 CPU).
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-4)


def test_fused_epilogue_matches_standard(monkeypatch):
    """The fused-exchange wiring (address math, cross-stream image ids,
    aux packing, view ordering) must reproduce the unfused V=2 path. On CPU
    the op runs its jnp reference, so this pins the integration, and the
    kernel itself is pinned to that reference in test_gather_epilogue."""
    model, params, scene = build(2)
    out_std = model.apply(params, scene)
    monkeypatch.setattr(CrossAttentionRenderer, '_use_fused_epilogue',
                        lambda self: not self.is_initializing())
    out_fused = model.apply(params, scene)
    np.testing.assert_allclose(np.asarray(out_std['rgb']),
                               np.asarray(out_fused['rgb']),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_std['at_wt']),
                               np.asarray(out_fused['at_wt']),
                               atol=2e-4, rtol=1e-4)


def test_fused_epilogue_gradients_match(monkeypatch):
    model, params, scene = build(2)

    def loss(p):
        out = model.apply(p, scene)
        return jnp.sum(out['rgb'] ** 2)

    g_std = jax.grad(loss)(params)
    monkeypatch.setattr(CrossAttentionRenderer, '_use_fused_epilogue',
                        lambda self: not self.is_initializing())
    g_fused = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        # f32 noise floor scales with the leaf's magnitude (grads here span
        # 1e-5 .. 1e3); elementwise rtol alone misfires on near-zeros.
        np.testing.assert_allclose(a, b, rtol=5e-3,
                                   atol=1e-5 * np.abs(a).max() + 5e-5)


@pytest.mark.slow
def test_fused_exchange_multi_matches_standard_v3(monkeypatch):
    """The V=3 multi-stream fused-exchange wiring (per-stream address
    math, cross-frame image ids, ascending-k stream order, cross-point
    gradient stop) must reproduce the unfused V=3 path. On CPU the op runs
    its jnp reference; the kernel is pinned in test_gather_epilogue."""
    model, params, scene = build(3)
    out_std = model.apply(params, scene)
    monkeypatch.setattr(CrossAttentionRenderer, '_use_fused_epilogue',
                        lambda self: not self.is_initializing())
    out_fused = model.apply(params, scene)
    np.testing.assert_allclose(np.asarray(out_std['rgb']),
                               np.asarray(out_fused['rgb']),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_std['at_wt']),
                               np.asarray(out_fused['at_wt']),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_exchange_multi_gradients_match_v3(monkeypatch):
    model, params, scene = build(3)

    def loss(p):
        out = model.apply(p, scene)
        return jnp.sum(out['rgb'] ** 2)

    g_std = jax.grad(loss)(params)
    monkeypatch.setattr(CrossAttentionRenderer, '_use_fused_epilogue',
                        lambda self: not self.is_initializing())
    g_fused = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=5e-3,
                                   atol=1e-5 * np.abs(a).max() + 5e-5)
