"""Unit tests for the fully-fused V=2 render core (ops/fused_render.py).

The jnp mirror is checked against the renderer's own standard path (the
strongest oracle: same params, same scene, whole out_dict); the Pallas
kernel is checked against the mirror in interpret mode; gradients flow
through the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_attention_renderer_tpu.ops import fused_render as FR

CHANNELS = (32, 32, 16)
F = sum(CHANNELS)
O = F // 2            # latent dim
HQ = 16               # attention hidden
B, R, P = 2, 8, 4
M = B * 2 * R * P


def _case(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.3, dtype)

    vals_both = tuple(arr(2 * M, 4 * c) for c in CHANNELS)
    aux = rng.random((2, M, 16)).astype(np.float32) * 0.5
    aux[:, ::5, :12] = 0.0
    lc = arr(M, 16)
    params = (arr(F + 3, F), arr(F), arr(F, O), arr(O),          # fuse
              arr(2 * O, O), arr(O),                             # latent_value
              arr(2 * O, HQ), arr(HQ), arr(HQ, HQ), arr(HQ),    # key_map(_2)
              arr(16, HQ), arr(HQ), arr(HQ, HQ), arr(HQ),       # query_embed
              arr(O, HQ), arr(HQ),                              # encode_latent
              arr(HQ + 16, HQ), arr(HQ), arr(HQ, HQ), arr(HQ))  # repeat
    return (vals_both, jnp.asarray(aux[0], dtype),
            jnp.asarray(aux[1], dtype), lc, params)


@pytest.mark.parametrize('repeat', [False, True])
def test_pallas_interpret_matches_reference(repeat):
    case = _case(1)
    z_ref, wt_ref = FR._reference(*case, CHANNELS, B, R, P, repeat)
    old = FR.RAY_BLOCK
    FR.RAY_BLOCK = 4
    try:
        z_p, wt_p = FR._pallas_forward(*case, CHANNELS, B, R, P, repeat,
                                       interpret=True)
    finally:
        FR.RAY_BLOCK = old
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_p),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wt_ref), np.asarray(wt_p),
                               atol=1e-5, rtol=1e-4)


def test_custom_vjp_matches_reference_grads():
    case = _case(2)
    vals_both, aux_s, aux_c, lc, params = case

    def loss_op(vb, p):
        z, wt = FR.fused_render_core(vb, aux_s, aux_c, lc, p, CHANNELS,
                                     B, R, P, True)
        return jnp.sum(z ** 2) + jnp.sum(wt ** 2)

    def loss_ref(vb, p):
        z, wt = FR._reference(vb, aux_s, aux_c, lc, p, CHANNELS,
                              B, R, P, True)
        return jnp.sum(z ** 2) + jnp.sum(wt.astype(z.dtype) ** 2)

    g_op = jax.grad(loss_op, argnums=(0, 1))(vals_both, params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(vals_both, params)
    for a, b in zip(jax.tree.leaves(g_op), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize('repeat', [True, False])
def test_renderer_path_matches_standard(monkeypatch, repeat):
    """The fused-render wiring (stacked takes, aux packing, local coords,
    param plumbing, both attention rounds) must reproduce the standard
    V=2 renderer outputs on CPU via the jnp mirror."""
    from cross_attention_renderer_tpu.data import make_scene
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer

    scene = make_scene(3, batch=1, n_view=2, H=32, W=32, n_rays=16)
    model = CrossAttentionRenderer(
        n_view=2, npoints=8, fusion_features=32, vit_width=64, vit_depth=2,
        vit_heads=2, resnet_layers=(1, 1, 1), repeat_attention=repeat)
    params = model.init(jax.random.PRNGKey(0), scene)
    out_std = model.apply(params, scene)
    monkeypatch.setattr(CrossAttentionRenderer, '_use_fused_render',
                        lambda self, R: True)
    out_fused = model.apply(params, scene)
    np.testing.assert_allclose(np.asarray(out_std['rgb']),
                               np.asarray(out_fused['rgb']),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_std['at_wt']),
                               np.asarray(out_fused['at_wt']),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_std['depth_ray']),
                               np.asarray(out_fused['depth_ray']),
                               atol=1e-4, rtol=1e-4)


def test_pallas_interpret_int8_tables_match_reference():
    # int8 gather tables (quantized fast-eval mode): rows cast to the
    # weights dtype in VMEM; mirror and kernel must agree.
    vals_both, aux_s, aux_c, lc, params = _case(4)
    vals_q = tuple(jnp.clip(jnp.round(v * 24.0), -127, 127).astype(jnp.int8)
                   for v in vals_both)
    z_ref, wt_ref = FR._reference(vals_q, aux_s, aux_c, lc, params,
                                  CHANNELS, B, R, P, True)
    assert z_ref.dtype == jnp.float32
    old = FR.RAY_BLOCK
    FR.RAY_BLOCK = 4
    try:
        z_p, wt_p = FR._pallas_forward(vals_q, aux_s, aux_c, lc, params,
                                       CHANNELS, B, R, P, True,
                                       interpret=True)
    finally:
        FR.RAY_BLOCK = old
    np.testing.assert_allclose(np.asarray(z_ref), np.asarray(z_p),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(wt_ref), np.asarray(wt_p),
                               atol=1e-5, rtol=1e-4)
