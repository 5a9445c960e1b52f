"""Image quality metrics (PSNR / SSIM), matching the reference eval protocol.

Ref: ``eval_realestate10k.py:181-199`` — images mapped to [0,1], invalid rays
greyed to 0.5 in BOTH prediction and target, MSE -> PSNR, and skimage
``structural_similarity(win_size=11, multichannel=True,
gaussian_weights=True)``. NOTE: the reference passes float images without
``data_range``, which old skimage resolves to 2.0 (float dtype assumed in
[-1, 1]) even though the images are in [0, 1]; ``data_range`` defaults to 2.0
here for parity and can be set to 1.0 for the strict definition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: Array, target: Array) -> Array:
    """-10 log10(mse); images in [0, 1]. Ref img2mse/mse2psnr usage."""
    return -10.0 * jnp.log10(mse(pred, target))


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(win: int, sigma: float) -> np.ndarray:
    r = np.arange(win) - (win - 1) / 2
    k = np.exp(-(r ** 2) / (2 * sigma ** 2))
    k = k / k.sum()
    return np.outer(k, k).astype(np.float32)


def ssim(pred: Array, target: Array, win_size: int = 11,
         sigma: float = 1.5, data_range: float = 2.0) -> Array:
    """Gaussian-weighted SSIM, channels averaged (skimage semantics).

    pred/target: (H, W, C) float images.
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = jnp.asarray(_gaussian_kernel(win_size, sigma))
    kern = kern[:, :, None, None]

    def filt(x):
        # depthwise valid conv: (H, W, C) -> (H', W', C), channels as batch
        x = x.transpose(2, 0, 1)[..., None]                    # (C,H,W,1)
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y[..., 0].transpose(1, 2, 0)                    # (H',W',C)

    ux, uy = filt(pred), filt(target)
    uxx, uyy, uxy = filt(pred * pred), filt(target * target), filt(
        pred * target)
    # skimage uses unbiased covariances with gaussian weights: vx = E[x^2]-E[x]^2
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    num = (2 * ux * uy + c1) * (2 * vxy + c2)
    den = (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)
    return jnp.mean(num / den)


def eval_image_metrics(pred01: Array, target01: Array,
                       valid_mask: Array) -> dict:
    """Grey-out invalid rays in both images, then MSE/PSNR/SSIM.

    Ref: eval_realestate10k.py:181-197.
    """
    pred = pred01 * valid_mask + 0.5 * (1 - valid_mask)
    target = target01 * valid_mask + 0.5 * (1 - valid_mask)
    m = mse(pred, target)
    return {
        'mse': m,
        'psnr': -10.0 * jnp.log10(m),
        'ssim': ssim(pred, target),
        'pred': pred,
        'target': target,
    }
