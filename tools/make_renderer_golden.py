"""Generate golden stage tensors from the reference CrossAttentionRenderer.

Runs the reference's torch forward (/root/reference/models.py:190-626) at a
small config with RANDOM-INIT heads and a fixed synthetic feature pyramid
``z`` (the timm DPT encoder is stubbed out — timm is not installed and the
pretrained blobs are not fetchable), records every numerically risky stage
via forward hooks, and writes the fixture consumed by
``tests/test_renderer_parity.py``:

  * the exact input scene and the synthetic ``z``,
  * the random torch state dict of all heads (converted to Flax params by
    ``tools/convert_checkpoint.py`` inside the test),
  * stage tensors: post-exchange ``interp_val``, ``joint_latent``,
    ``key_val``, ``coords_embed``, round-2 query embed, ``phi`` input, and
    the out_dict (rgb / depth_ray / at_wt / pixel_val / valid_mask).

Stage coverage targets the reference's highest-risk math: epipolar sampling
(models.py:226-275), both pyramid gathers (models.py:278,317), the 2-view
latent exchange (models.py:281-347), both attention rounds
(models.py:532-565), the attention depth head (models.py:573-594) and the
light-field decode (models.py:599-617).

Usage (CPU, zero egress):
  JAX_PLATFORMS=cpu python tools/make_renderer_golden.py [--views 3]
"""

from __future__ import annotations

import argparse
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE = '/root/reference'


def _stub_module(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install_stubs():
    """Stub the imports the reference needs but this env lacks (timm,
    torchvision). Only module OBJECTS are stubbed; no reference code path
    that we record ever executes stubbed functionality."""
    class _StdConvStub(nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    _dummy = type('_TimmStub', (), {})
    timm = _stub_module('timm')
    timm.models = _stub_module('timm.models')
    vt = _stub_module('timm.models.vision_transformer')
    vt._create_vision_transformer = _dummy
    vt.checkpoint_filter_fn = _dummy
    vt.Block = _dummy
    vt._init_vit_weights = _dummy
    vth = _stub_module('timm.models.vision_transformer_hybrid')
    vth._resnetv2 = _dummy
    vth.HybridEmbed = _dummy
    vth.default_cfgs = {}
    layers = _stub_module('timm.models.layers')
    layers.PatchEmbed = _dummy
    layers.trunc_normal_ = _dummy
    std_conv = _stub_module('timm.models.layers.std_conv')
    std_conv.StdConv2dSame = _StdConvStub
    layers.std_conv = std_conv
    helpers = _stub_module('timm.models.helpers')
    helpers.build_model_with_cfg = _dummy
    timm.models.vision_transformer = vt
    timm.models.vision_transformer_hybrid = vth
    timm.models.layers = layers
    timm.models.helpers = helpers
    tv = _stub_module('torchvision')
    tv.transforms = _stub_module('torchvision.transforms')
    tv.models = _stub_module('torchvision.models')


class _EncoderStub(nn.Module):
    """Carries the attribute chain models.py:92 assigns into."""

    def __init__(self):
        super().__init__()
        stem = nn.Module()
        backbone = nn.Module()
        backbone.stem = stem
        patch_embed = nn.Module()
        patch_embed.backbone = backbone
        model = nn.Module()
        model.patch_embed = patch_embed
        self.pretrained = nn.Module()
        self.pretrained.model = model


def build_reference_model(n_view: int, npoints: int):
    install_stubs()
    # The reference hardcodes .cuda() in geometry.py (e.g. :320); run those
    # tensors on CPU unchanged.
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REFERENCE)
    from midas import dpt_depth
    dpt_depth.DPTDepthModel = lambda **kw: _EncoderStub()
    import models as ref_models

    torch.manual_seed(20260816)
    model = ref_models.CrossAttentionRenderer(
        n_view=n_view, npoints=npoints, model='midas_vit')
    model.eval()
    return model


def make_scene(seed: int, n_view: int, H: int, W: int, R: int):
    """Numpy version of data/synthetic.make_scene's camera geometry
    (cameras on a radius-2 shell looking at the origin)."""
    rng = np.random.default_rng(seed)

    def look_at(eye):
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0.0, 1.0, 0.0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, eye
        return m

    base = rng.normal(0, 1, 3)
    base = 2.0 * base / np.linalg.norm(base)
    ctx_c2w = np.stack([look_at(base + rng.normal(0, 0.35, 3))
                        for _ in range(n_view)])[None]
    qry_c2w = look_at(base + rng.normal(0, 0.2, 3))[None, None]
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 0.98 * H
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0
    uv = np.stack([rng.uniform(0, W - 1, R), rng.uniform(0, H - 1, R)],
                  -1)[None, None]
    rgb = rng.uniform(-1, 1, (1, n_view, H, W, 3))
    return {
        'context': {'rgb': rgb.astype(np.float32),
                    'cam2world': ctx_c2w.astype(np.float32),
                    'intrinsics': np.broadcast_to(
                        K, (1, n_view, 4, 4)).astype(np.float32).copy()},
        'query': {'cam2world': qry_c2w.astype(np.float32),
                  'intrinsics': K[None, None].astype(np.float32).copy(),
                  'uv': uv.astype(np.float32)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--views', type=int, default=2)
    ap.add_argument('--npoints', type=int, default=16)
    ap.add_argument('--rays', type=int, default=32)
    ap.add_argument('--size', type=int, default=32)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    H = W = args.size
    model = build_reference_model(args.views, args.npoints)
    scene = make_scene(7, args.views, H, W, args.rays)

    BV = args.views
    rng = np.random.default_rng(11)
    # Synthetic DPT pyramid: two fusion maps (H/4, H/2) + full-res conv map,
    # channel-first like the reference encoder emits (models.py:148-188).
    z = [rng.normal(0, 1, (BV, 256, H // 4, W // 4)).astype(np.float32),
         rng.normal(0, 1, (BV, 256, H // 2, W // 2)).astype(np.float32),
         rng.normal(0, 1, (BV, 64, H, W)).astype(np.float32)]

    stages = {}

    def cap_out(name):
        def hook(mod, inp, out):
            stages.setdefault(name, []).append(
                out.detach().numpy().astype(np.float32))
        return hook

    def cap_in(name, idx=0):
        def hook(mod, inp, out):
            stages.setdefault(name, []).append(
                inp[idx].detach().numpy().astype(np.float32))
        return hook

    model.latent_value.register_forward_hook(cap_in('interp_val'))
    model.latent_value.register_forward_hook(cap_out('joint_latent'))
    model.key_map_2.register_forward_hook(cap_out('key_val'))
    model.query_embed_2.register_forward_hook(cap_out('coords_embed'))
    model.query_repeat_embed_2.register_forward_hook(cap_out('repeat_embed'))
    model.encode_latent.register_forward_hook(cap_out('z_embed'))
    model.phi.register_forward_hook(cap_in('phi_in'))
    if args.views > 1:
        model.query_encode_latent_2.register_forward_hook(
            cap_out('exchange_encode'))

    tin = {
        'context': {k: torch.from_numpy(v.copy())
                    for k, v in scene['context'].items()},
        'query': {k: torch.from_numpy(v.copy())
                  for k, v in scene['query'].items()},
    }
    tz = [torch.from_numpy(a) for a in z]
    # get_z (which sets self.H/self.W, models.py:166) is skipped when z is
    # provided — set them the way the reference eval loop's first call does.
    model.H, model.W = H, W
    with torch.no_grad():
        out = model(tin, z=tz)

    payload = {}
    for k, v in scene['context'].items():
        payload[f'scene_context_{k}'] = v
    for k, v in scene['query'].items():
        payload[f'scene_query_{k}'] = v
    for i, a in enumerate(z):
        payload[f'z_{i}'] = a
    for name, vals in stages.items():
        for i, a in enumerate(vals):
            payload[f'stage_{name}_{i}'] = a
    for name in ('rgb', 'depth_ray', 'at_wt', 'valid_mask'):
        payload[f'out_{name}'] = out[name].detach().numpy().astype(
            np.float32)
    payload['out_pixel_val'] = out['pixel_val'].detach().numpy().astype(
        np.float32)
    for k, v in model.state_dict().items():
        payload[f'sd_{k}'] = v.numpy()
    payload['meta'] = np.array([args.views, args.npoints, H, W, args.rays])

    path = args.out or (f'tests/fixtures/renderer_golden_v{args.views}.npz')
    np.savez_compressed(path, **payload)
    import os
    print(f'wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB, '
          f'{len(payload)} arrays)')


if __name__ == '__main__':
    main()
