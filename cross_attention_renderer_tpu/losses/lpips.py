"""LPIPS (VGG) perceptual distance in JAX.

Re-implementation of the ``lpips`` package's VGG variant used by the
reference (loss_functions.py:90-92, eval_realestate10k.py:124): VGG16
conv-feature stack, per-layer unit-normalization across channels, learned
1x1 linear heads, spatial mean, layer sum.

Weights cannot be downloaded in this environment (zero egress), so the
module loads from a converted ``.npz``:

  * ``convert_weights(torch_vgg_state, torch_lpips_state, out_path)``
    converts torchvision VGG16 + lpips linear checkpoints when present;
  * ``load_lpips(path=None)`` builds the distance fn from the npz (path or
    $LPIPS_WEIGHTS or data/lpips_vgg.npz) and raises a clear error
    otherwise — callers treat LPIPS as optional exactly like the reference
    flags do.

Inputs are (..., H, W, 3) images in [-1, 1] (lpips convention).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# VGG16 feature config: conv channels per block (torchvision 'D' config).
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
               (512, 512, 512), (512, 512, 512))
# LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.

# lpips package input scaling (lpips/lpips.py ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_features(weights: dict, x: Array) -> list[Array]:
    """Run VGG16 convs, return the 5 tap activations (post-ReLU)."""
    taps = []
    idx = 0
    for b, block in enumerate(_VGG_BLOCKS):
        for c, _ in enumerate(block):
            w = weights[f'conv{idx}_w']
            bias = weights[f'conv{idx}_b']
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
            x = jax.nn.relu(x)
            idx += 1
        taps.append(x)
        if b < len(_VGG_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                'VALID')
    return taps


def _normalize_channels(x: Array, eps: float = 1e-10) -> Array:
    # eps is added to the norm, not the sum — exactly the lpips package's
    # normalize_tensor (lpips/__init__.py), pinned by the torch parity test.
    return x / (jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True)) + eps)


def lpips_distance(weights: dict, img0: Array, img1: Array) -> Array:
    """Per-image LPIPS distance; img*: (B, H, W, 3) in [-1, 1]."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale
    f0 = _vgg_features(weights, x0)
    f1 = _vgg_features(weights, x1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (_normalize_channels(a) - _normalize_channels(b)) ** 2
        lin = weights[f'lin{i}_w']  # (C,) nonnegative 1x1 head
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(-1, -2))
    return total


def default_weights_path() -> Path:
    env = os.environ.get('LPIPS_WEIGHTS')
    if env:
        return Path(env)
    return Path(__file__).parent / 'weights' / 'lpips_vgg.npz'


def load_lpips(path: Optional[str] = None) -> Callable:
    """Build ``fn(img0, img1) -> (B,) distances`` from converted weights."""
    p = Path(path) if path else default_weights_path()
    if not p.exists():
        raise FileNotFoundError(
            f'LPIPS weights not found at {p}. Convert them with '
            f'cross_attention_renderer_tpu.losses.lpips.convert_weights '
            f'from a torchvision VGG16 + lpips checkpoint, or set '
            f'$LPIPS_WEIGHTS.')
    raw = dict(np.load(p))
    weights = {k: jnp.asarray(v) for k, v in raw.items()}
    return jax.jit(lambda a, b: lpips_distance(weights, a, b))


def convert_weights(vgg_state: dict, lpips_state: dict, out_path: str):
    """Convert torch state dicts to the npz layout.

    vgg_state: torchvision ``vgg16(weights=...).features.state_dict()``
    lpips_state: ``lpips.LPIPS(net='vgg')`` state dict (lin layers).
    """
    out = {}
    conv_ids = [k.split('.')[0] for k in vgg_state if k.endswith('.weight')]
    conv_ids = sorted(set(int(i) for i in conv_ids))
    for i, layer in enumerate(conv_ids):
        w = np.asarray(vgg_state[f'{layer}.weight'])  # (out,in,kh,kw)
        out[f'conv{i}_w'] = w.transpose(2, 3, 1, 0)   # HWIO
        out[f'conv{i}_b'] = np.asarray(vgg_state[f'{layer}.bias'])
    for i in range(5):
        key = f'lins.{i}.model.1.weight'
        if key not in lpips_state:
            key = f'lin{i}.model.1.weight'
        w = np.asarray(lpips_state[key])              # (1, C, 1, 1)
        out[f'lin{i}_w'] = w.reshape(-1)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **out)
    return out_path
