"""SuperPoint keypoint detector + descriptor in JAX.

Functional re-implementation of the detector the reference vendors
(``estimate_pose/superpoint.py:95-202``), redesigned for TPU static shapes:
instead of ``torch.nonzero`` + Python list filtering (superpoint.py:170-187),
keypoints are extracted as a fixed top-K over the NMS'd score map with a
validity mask (below-threshold / border slots are masked out, not dropped).

Weights: the reference repo's ``superpoint_v1.pth`` blob is git-LFS-missing
(.MISSING_LARGE_BLOBS); :func:`convert_weights` maps the upstream MagicLeap
checkpoint when one is available, and random init is supported for tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_CHANNELS = (64, 64, 128, 128)
_DETECTOR_CH = 256
_DESC_DIM = 256


def init_params(rng: np.random.Generator | int = 0) -> dict:
    """Random parameters with the exact checkpoint layout (for tests)."""
    rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
    p = {}

    def conv(name, cin, cout, k):
        p[f'{name}_w'] = rng.normal(0, 0.05, (k, k, cin, cout)).astype(
            np.float32)
        p[f'{name}_b'] = np.zeros(cout, np.float32)

    cin = 1
    for i, c in enumerate(_CHANNELS):
        conv(f'conv{i + 1}a', cin, c, 3)
        conv(f'conv{i + 1}b', c, c, 3)
        cin = c
    conv('convPa', cin, _DETECTOR_CH, 3)
    conv('convPb', _DETECTOR_CH, 65, 1)
    conv('convDa', cin, _DETECTOR_CH, 3)
    conv('convDb', _DETECTOR_CH, _DESC_DIM, 1)
    return p


def convert_weights(torch_state: dict) -> dict:
    """torch state_dict -> our npz layout (OIHW -> HWIO)."""
    out = {}
    for k, v in torch_state.items():
        name = k.split('.')[0]
        v = np.asarray(v)
        if k.endswith('weight'):
            out[f'{name}_w'] = v.transpose(2, 3, 1, 0)
        else:
            out[f'{name}_b'] = v
    return out


def _conv(p: dict, name: str, x: Array, relu: bool = True) -> Array:
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p[f'{name}_w']), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + jnp.asarray(
            p[f'{name}_b'])
    return jax.nn.relu(y) if relu else y


def _pool2(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')


def simple_nms(scores: Array, radius: int) -> Array:
    """Iterated max-pool NMS. Ref: superpoint.py:47-62. scores: (B, H, W)."""
    k = 2 * radius + 1

    def maxpool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, k, k), (1, 1, 1), 'SAME')

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(2):
        supp = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp, zeros, scores)
        new_max = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max & ~supp)
    return jnp.where(max_mask, scores, zeros)


def _sample_descriptors(kpts_xy: Array, desc_map: Array, s: int = 8) -> Array:
    """Bilinear descriptor sampling at keypoints, align_corners=True.

    Ref: superpoint.py:80-92. desc_map: (B, h, w, C); kpts: (B, K, 2) pixel.
    """
    B, h, w, C = desc_map.shape
    k = kpts_xy - s / 2 + 0.5
    k = k / jnp.asarray([w * s - s / 2 - 0.5, h * s - s / 2 - 0.5],
                        desc_map.dtype)
    # torch normalizes to ndc then samples align_corners=True; composed,
    # that is simply pixel = k * (S - 1) on the descriptor grid.
    x = k[..., 0] * (w - 1)
    y = k[..., 1] * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(ix, iy):
        flat = (iy * w + ix).astype(jnp.int32)
        return jax.vmap(lambda m, i: jnp.take(m, i, axis=0))(
            desc_map.reshape(B, h * w, C), flat)

    v = (gather(x0, y0) * (1 - wx) * (1 - wy)
         + gather(x1, y0) * wx * (1 - wy)
         + gather(x0, y1) * (1 - wx) * wy
         + gather(x1, y1) * wx * wy)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def superpoint(params: dict, image: Array, max_keypoints: int = 1024,
               nms_radius: int = 4, keypoint_threshold: float = 0.005,
               border: int = 4) -> dict:
    """Detect keypoints + descriptors.

    Args:
      image: (B, H, W, 1) grayscale in [0, 1].
    Returns dict(keypoints (B,K,2) xy pixels, scores (B,K), valid (B,K) bool,
    descriptors (B,K,256)); K = max_keypoints, invalid slots masked.
    """
    x = image
    for i in range(4):
        x = _conv(params, f'conv{i + 1}a', x)
        x = _conv(params, f'conv{i + 1}b', x)
        if i < 3:
            x = _pool2(x)

    cpa = _conv(params, 'convPa', x)
    logits = _conv(params, 'convPb', cpa, relu=False)  # (B, h, w, 65)
    scores = jax.nn.softmax(logits, axis=-1)[..., :-1]
    B, h, w, _ = scores.shape
    # depth-to-space 8x: (B, h, w, 64) -> (B, 8h, 8w)
    scores = scores.reshape(B, h, w, 8, 8).transpose(0, 1, 3, 2, 4)
    scores = scores.reshape(B, h * 8, w * 8)
    scores = simple_nms(scores, nms_radius)

    H, W = h * 8, w * 8
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = ((ys >= border) & (ys < H - border)
                 & (xs >= border) & (xs < W - border))
    masked = jnp.where(in_border[None], scores, 0.0)

    flat = masked.reshape(B, H * W)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    kx = (top_idx % W).astype(jnp.float32)
    ky = (top_idx // W).astype(jnp.float32)
    keypoints = jnp.stack([kx, ky], axis=-1)
    valid = top_scores > keypoint_threshold

    cda = _conv(params, 'convDa', x)
    dmap = _conv(params, 'convDb', cda, relu=False)
    dmap = dmap / jnp.maximum(
        jnp.linalg.norm(dmap, axis=-1, keepdims=True), 1e-12)
    descriptors = _sample_descriptors(keypoints, dmap)

    return {'keypoints': keypoints, 'scores': top_scores, 'valid': valid,
            'descriptors': descriptors}
