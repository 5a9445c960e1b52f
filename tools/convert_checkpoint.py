"""Convert a reference CrossAttentionRenderer checkpoint to this framework.

Maps the PyTorch state dict of yilundu/cross_attention_renderer
(``torch.save({'model': state_dict, ...})``, training.py:118-120) onto the
Flax parameter tree of :class:`CrossAttentionRenderer`. Layer-type
conversions:

  torch Linear  (out, in)        -> Dense kernel (in, out)            [T]
  torch Conv2d 1x1 (o, i, 1, 1)  -> Dense kernel (i, o)               [squeeze+T]
  torch Conv1d 1x1 (o, i, 1)     -> Dense kernel (i, o)
  torch Conv2d kxk (o, i, k, k)  -> nn.Conv kernel (k, k, i, o)       [HWIO]
  timm ViT qkv fused (3E, E)     -> flax MHA query/key/value kernels
                                    (E, heads, head_dim) each
  GroupNorm/LayerNorm weight/bias -> scale/bias

Usage:
  python tools/convert_checkpoint.py --torch_ckpt model.pth --out params.msgpack

The per-layer math is unit-tested in tests/test_convert.py against live
torch layers; the end-to-end mapping of the decoder is additionally verified
numerically in tests/test_resnetfc_parity.py. The DPT-hybrid encoder mapping
follows the documented checkpoint layout (midas/vit.py + blocks.py names);
numerical end-to-end validation requires the actual pretrained blobs, which
are not fetchable in this environment.
"""

from __future__ import annotations

import argparse
import re
from typing import Callable

import numpy as np


def t_linear(w, b=None):
    out = {'kernel': np.asarray(w).T}
    if b is not None:
        out['bias'] = np.asarray(b)
    return out


def t_conv1x1(w, b=None):
    """(o, i, 1[, 1]) -> Dense (i, o)."""
    w = np.asarray(w).reshape(w.shape[0], w.shape[1])
    return t_linear(w, b)


def t_conv(w, b=None):
    """(o, i, kh, kw) -> (kh, kw, i, o)."""
    out = {'kernel': np.asarray(w).transpose(2, 3, 1, 0)}
    if b is not None:
        out['bias'] = np.asarray(b)
    return out


def t_norm(w, b):
    return {'scale': np.asarray(w), 'bias': np.asarray(b)}


def t_qkv(w, b, heads: int):
    """timm fused qkv (3E, E) -> flax MHA q/k/v kernels (E, heads, hd)."""
    w = np.asarray(w)
    E = w.shape[1]
    hd = E // heads
    out = {}
    for i, name in enumerate(('query', 'key', 'value')):
        wi = w[i * E:(i + 1) * E].T.reshape(E, heads, hd)
        entry = {'kernel': wi}
        if b is not None:
            entry['bias'] = np.asarray(b)[i * E:(i + 1) * E].reshape(heads,
                                                                     hd)
        out[name] = entry
    return out


def t_attn_out(w, b, heads: int):
    """timm proj (E, E) -> flax MHA out kernel (heads, hd, E)."""
    w = np.asarray(w)
    E = w.shape[0]
    hd = E // heads
    entry = {'kernel': w.T.reshape(heads, hd, E)}
    if b is not None:
        entry['bias'] = np.asarray(b)
    return entry


# ---------------------------------------------------------------------------
# Head mapping (reference constructor models.py:101-145 -> our setup()).
# Each entry: reference prefix -> (our path, converter).
# ---------------------------------------------------------------------------

HEAD_MAP: dict[str, tuple[str, Callable]] = {
    'query_encode_latent': ('query_encode_latent', t_conv1x1),
    'query_encode_latent_2': ('query_encode_latent_2', t_conv1x1),
    'update_val_merge': ('update_val_merge', t_conv1x1),
    'latent_value': ('latent_value', t_conv1x1),
    'key_map': ('key_map', t_conv1x1),
    'key_map_2': ('key_map_2', t_conv1x1),
    'query_embed': ('query_embed', t_conv1x1),
    'query_embed_2': ('query_embed_2', t_conv1x1),
    'encode_latent': ('encode_latent', t_conv1x1),      # Conv1d
    'query_repeat_embed': ('query_repeat_embed', t_conv1x1),
    'query_repeat_embed_2': ('query_repeat_embed_2', t_conv1x1),
    'conv_map': ('conv_map', t_conv),                   # 7x7 full conv
}


def convert_phi(sd: dict, prefix: str = 'phi.') -> dict:
    """ResnetFC decoder (verified numerically in test_resnetfc_parity)."""
    g = lambda k: sd[prefix + k]
    out = {'lin_in': t_linear(g('lin_in.weight'), g('lin_in.bias')),
           'lin_out': t_linear(g('lin_out.weight'), g('lin_out.bias'))}
    i = 0
    while f'{prefix}blocks.{i}.fc_0.weight' in sd:
        out[f'lin_z{i}'] = t_linear(g(f'lin_z.{i}.weight'),
                                    g(f'lin_z.{i}.bias'))
        out[f'block{i}'] = {
            'fc_0': t_linear(g(f'blocks.{i}.fc_0.weight'),
                             g(f'blocks.{i}.fc_0.bias')),
            'fc_1': t_linear(g(f'blocks.{i}.fc_1.weight'),
                             g(f'blocks.{i}.fc_1.bias')),
        }
        i += 1
    return out


def convert_vit_block(sd: dict, prefix: str, heads: int = 12) -> dict:
    g = lambda k: sd[prefix + k]
    out = {
        'norm1': t_norm(g('norm1.weight'), g('norm1.bias')),
        'norm2': t_norm(g('norm2.weight'), g('norm2.bias')),
        'mlp_fc1': t_linear(g('mlp.fc1.weight'), g('mlp.fc1.bias')),
        'mlp_fc2': t_linear(g('mlp.fc2.weight'), g('mlp.fc2.bias')),
        'attn': {**t_qkv(g('attn.qkv.weight'), g('attn.qkv.bias'), heads),
                 'out': t_attn_out(g('attn.proj.weight'),
                                   g('attn.proj.bias'), heads)},
    }
    return out


def convert_resnetv2_block(sd: dict, prefix: str) -> dict:
    """timm non-preact ResNetV2 Bottleneck (the ViT-hybrid variant)."""
    g = lambda k: sd[prefix + k]
    out = {}
    for i in (1, 2, 3):
        out[f'conv{i}'] = {'kernel': np.asarray(
            g(f'conv{i}.weight')).transpose(2, 3, 1, 0)}
        out[f'norm{i}'] = {'GroupNorm_0': t_norm(g(f'norm{i}.weight'),
                                                 g(f'norm{i}.bias'))}
    if prefix + 'downsample.conv.weight' in sd:
        out['downsample_conv'] = {'kernel': np.asarray(
            g('downsample.conv.weight')).transpose(2, 3, 1, 0)}
        out['downsample_norm'] = {'GroupNorm_0': t_norm(
            g('downsample.norm.weight'), g('downsample.norm.bias'))}
    return out


def convert_reference_state_dict(sd: dict, n_view: int = 2,
                                 vit_depth: int = 12,
                                 resnet_layers=(3, 4, 9)) -> dict:
    """Full reference state dict -> Flax params['params'] tree.

    Weight-standardized conv kernels convert identically (standardization is
    recomputed from the kernel in our forward, matching timm StdConv2d).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {}

    for ref, (ours, conv) in HEAD_MAP.items():
        wk, bk = f'{ref}.weight', f'{ref}.bias'
        if wk in sd:
            p[ours] = conv(sd[wk], sd.get(bk))
    p['phi'] = convert_phi(sd)

    enc_prefix = 'encoder.pretrained.model.'
    backbone = {}
    bb = enc_prefix + 'patch_embed.backbone.'
    if bb + 'stem.conv.weight' in sd:
        backbone['stem_conv'] = {'kernel': np.asarray(
            sd[bb + 'stem.conv.weight']).transpose(2, 3, 1, 0)}
        backbone['stem_norm'] = {'GroupNorm_0': t_norm(
            sd[bb + 'stem.norm.weight'], sd[bb + 'stem.norm.bias'])}
        for s, n_blocks in enumerate(resnet_layers):
            for b in range(n_blocks):
                backbone[f'stage{s}_block{b}'] = convert_resnetv2_block(
                    sd, f'{bb}stages.{s}.blocks.{b}.')
    vit = {}
    if enc_prefix + 'cls_token' in sd:
        vit['cls_token'] = sd[enc_prefix + 'cls_token']
        vit['pos_embed'] = sd[enc_prefix + 'pos_embed']
        vit['pose_embed'] = t_linear(sd[enc_prefix + 'pose_embed.weight'],
                                     sd[enc_prefix + 'pose_embed.bias'])
        vit['patch_proj'] = t_conv1x1(
            sd[enc_prefix + 'patch_embed.proj.weight'],
            sd[enc_prefix + 'patch_embed.proj.bias'])
        for i in range(vit_depth):
            vit[f'block{i}'] = convert_vit_block(sd,
                                                 f'{enc_prefix}blocks.{i}.')
    encoder = {}
    if backbone:
        encoder['backbone'] = backbone
    if vit:
        encoder['vit'] = vit

    # DPT scratch + refinenets (midas/blocks.py names)
    sc = 'encoder.scratch.'
    for i in (1, 2, 3, 4):
        k = f'{sc}layer{i}_rn.weight'
        if k in sd:
            encoder[f'layer{i}_rn'] = {'kernel': np.asarray(
                sd[k]).transpose(2, 3, 1, 0)}
    for i in (1, 2, 3, 4):
        pref = f'{sc}refinenet{i}.'
        if pref + 'out_conv.weight' in sd:
            rn = {'out_conv': t_conv(sd[pref + 'out_conv.weight'],
                                     sd[pref + 'out_conv.bias'])}
            for j, name in ((1, 'rcu1'), (2, 'rcu2')):
                cpref = f'{pref}resConfUnit{j}.'
                if cpref + 'conv1.weight' in sd:
                    rn[name] = {
                        'conv1': t_conv(sd[cpref + 'conv1.weight'],
                                        sd[cpref + 'conv1.bias']),
                        'conv2': t_conv(sd[cpref + 'conv2.weight'],
                                        sd[cpref + 'conv2.bias']),
                    }
            encoder[f'refinenet{i}'] = rn
    # readout projections (act_postprocess3/4 position 0 = ProjectReadout)
    for i, ours in ((3, 'ProjectReadout_0'), (4, 'ProjectReadout_1')):
        k = f'encoder.pretrained.act_postprocess{i}.0.project.0.weight'
        if k in sd:
            encoder[ours] = {'project': t_linear(
                sd[k],
                sd[f'encoder.pretrained.act_postprocess{i}.0.project.0.bias'])}
    for ref, ours, conv in (
            ('encoder.pretrained.act_postprocess3.3', 'post3_conv', t_conv),
            ('encoder.pretrained.act_postprocess4.3', 'post4_conv1', t_conv),
            ('encoder.pretrained.act_postprocess4.4', 'post4_conv2', t_conv)):
        if f'{ref}.weight' in sd:
            encoder[ours] = conv(sd[f'{ref}.weight'], sd.get(f'{ref}.bias'))

    if encoder:
        p['encoder'] = encoder
    return {'params': p}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--torch_ckpt', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--views', type=int, default=2)
    args = ap.parse_args()

    import torch
    from flax import serialization
    ckpt = torch.load(args.torch_ckpt, map_location='cpu')
    sd = ckpt.get('model', ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_reference_state_dict(sd, n_view=args.views)
    with open(args.out, 'wb') as f:
        f.write(serialization.to_bytes(params))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
