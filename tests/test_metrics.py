"""Metric tests: SSIM cross-checked against a direct scipy implementation."""

import numpy as np
import jax.numpy as jnp
from scipy.signal import convolve2d

from cross_attention_renderer_tpu.utils import metrics as M


def _ssim_numpy(a, b, win=11, sigma=1.5, data_range=2.0):
    r = np.arange(win) - (win - 1) / 2
    k1d = np.exp(-(r ** 2) / (2 * sigma ** 2))
    k1d /= k1d.sum()
    kern = np.outer(k1d, k1d)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def filt(x):
        return np.stack([convolve2d(x[..., c], kern, mode='valid')
                         for c in range(x.shape[-1])], -1)

    ux, uy = filt(a), filt(b)
    vx = filt(a * a) - ux ** 2
    vy = filt(b * b) - uy ** 2
    vxy = filt(a * b) - ux * uy
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)
         / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    return s.mean()


def test_ssim_matches_direct():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _ssim_numpy(a, b)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ssim_identity_and_monotonic():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    assert float(M.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999
    small = float(M.ssim(jnp.asarray(a), jnp.asarray(
        np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32))))
    big = float(M.ssim(jnp.asarray(a), jnp.asarray(
        np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32))))
    assert big < small < 1.0


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(M.psnr(a, b)), 20.0, atol=1e-4)


def test_eval_image_metrics_grey_out():
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    mask = jnp.zeros((16, 16, 1))
    m = M.eval_image_metrics(pred, target, mask)
    # fully invalid -> both images grey -> perfect score
    assert float(m['mse']) == 0.0
