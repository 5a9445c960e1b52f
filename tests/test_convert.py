"""Checkpoint-conversion math: every layer-type converter verified against
live torch layers, plus head-mapping structural checks."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import flax.linen as nn

sys.path.insert(0, 'tools')
from convert_checkpoint import (  # noqa: E402
    t_attn_out, t_conv, t_conv1x1, t_linear, t_qkv)


def test_linear_conversion():
    lin = torch.nn.Linear(7, 5).double()
    x = np.random.default_rng(0).normal(size=(3, 7))
    want = lin(torch.tensor(x)).detach().numpy()
    p = t_linear(lin.weight.detach().numpy(), lin.bias.detach().numpy())
    got = x @ p['kernel'] + p['bias']
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_conv1x1_conversion():
    conv = torch.nn.Conv2d(6, 4, 1).double()
    x = np.random.default_rng(1).normal(size=(2, 6, 3, 3))
    want = conv(torch.tensor(x)).detach().numpy()  # (2,4,3,3)
    p = t_conv1x1(conv.weight.detach().numpy(), conv.bias.detach().numpy())
    got = np.einsum('bchw,cd->bdhw', x, p['kernel']) + p['bias'][None, :,
                                                                 None, None]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_convkxk_conversion():
    conv = torch.nn.Conv2d(3, 8, 7, padding=3)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 9, 9, 3)).astype(np.float32)
    want = conv(torch.tensor(x.transpose(0, 3, 1, 2))
                ).detach().numpy().transpose(0, 2, 3, 1)
    p = t_conv(conv.weight.detach().numpy(), conv.bias.detach().numpy())
    mod = nn.Conv(8, (7, 7), padding=3)
    got = mod.apply({'params': {'kernel': jnp.asarray(p['kernel']),
                                'bias': jnp.asarray(p['bias'])}},
                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_fused_qkv_conversion():
    """timm-style fused qkv + proj == flax MultiHeadDotProductAttention."""
    E, heads, N = 16, 4, 6
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, N, E)).astype(np.float32)
    qkv_w = rng.normal(0, 0.2, (3 * E, E)).astype(np.float32)
    qkv_b = rng.normal(0, 0.1, (3 * E,)).astype(np.float32)
    proj_w = rng.normal(0, 0.2, (E, E)).astype(np.float32)
    proj_b = rng.normal(0, 0.1, (E,)).astype(np.float32)

    # torch-side timm attention math
    t = torch.tensor
    qkv = torch.tensor(x) @ t(qkv_w).T + t(qkv_b)
    q, k, v = qkv.split(E, dim=-1)
    hd = E // heads

    def heads_split(a):
        return a.reshape(1, N, heads, hd).permute(0, 2, 1, 3)

    q, k, v = map(heads_split, (q, k, v))
    at = torch.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, dim=-1)
    out = (at @ v).permute(0, 2, 1, 3).reshape(1, N, E)
    want = (out @ t(proj_w).T + t(proj_b)).numpy()

    params = {**t_qkv(qkv_w, qkv_b, heads),
              'out': t_attn_out(proj_w, proj_b, heads)}
    params = jax.tree.map(jnp.asarray, params)
    mod = nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=E,
                                          use_bias=True)
    got = mod.apply({'params': params}, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.slow
def test_head_mapping_targets_exist():
    """Every HEAD_MAP target is a real parameter collection of the model."""
    from convert_checkpoint import HEAD_MAP
    from cross_attention_renderer_tpu.models import CrossAttentionRenderer
    from cross_attention_renderer_tpu.data import make_scene
    model = CrossAttentionRenderer(n_view=2, npoints=8, fusion_features=32,
                                   vit_width=64, vit_depth=2, vit_heads=2,
                                   resnet_layers=(1, 1, 1))
    scene = make_scene(0, batch=1, n_view=2, H=64, W=64, n_rays=8)
    params = model.init(jax.random.PRNGKey(0), scene)['params']
    ours = set(params.keys())
    for ref, (target, _) in HEAD_MAP.items():
        if target in ('update_val_merge',):   # 1-view-only head
            continue
        assert target in ours, (ref, target)
