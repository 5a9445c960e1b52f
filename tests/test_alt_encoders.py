"""Alternate encoder families through the full renderer (reference --model
resnet / unet paths, models.py:63-99)."""

import jax
import jax.numpy as jnp
import pytest

from cross_attention_renderer_tpu.data import make_scene
from cross_attention_renderer_tpu.models import CrossAttentionRenderer


@pytest.mark.parametrize(
    'model_name,latent', [pytest.param('unet', 960,
                                       marks=pytest.mark.slow),
                          ('resnet', 512)])
def test_alt_encoder_forward(model_name, latent):
    scene = make_scene(0, batch=1, n_view=2, H=64, W=64, n_rays=16)
    model = CrossAttentionRenderer(n_view=2, npoints=8, model=model_name)
    assert model.base_latent_dim == latent
    params = model.init(jax.random.PRNGKey(0), scene)
    out = model.apply(params, scene)
    assert out['rgb'].shape == (1, 1, 16, 3)
    assert bool(jnp.isfinite(out['rgb']).all())
    # z caching works for the alternates too
    z = model.apply(params, scene, method='encode')
    out2 = model.apply(params, scene, z=z)
    assert jnp.array_equal(out['rgb'], out2['rgb'])


def test_alt_encoder_single_view():
    scene = make_scene(1, batch=1, n_view=1, H=64, W=64, n_rays=16)
    model = CrossAttentionRenderer(n_view=1, npoints=8, model='unet')
    params = model.init(jax.random.PRNGKey(0), scene)
    out = model.apply(params, scene)
    assert bool(jnp.isfinite(out['rgb']).all())
