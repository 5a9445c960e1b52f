"""grid_sample parity vs torch.nn.functional.grid_sample (the oracle the
reference uses at models.py:278,317)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cross_attention_renderer_tpu.ops import grid_sample, grid_sample_pyramid


@pytest.mark.parametrize('padding', ['border', 'zeros'])
@pytest.mark.parametrize('shape', [(2, 16, 16, 8), (3, 64, 64, 5)])
def test_matches_torch(padding, shape):
    rng = np.random.default_rng(1)
    B, H, W, C = shape
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # include far out-of-bounds and exact-boundary coords
    coords = rng.uniform(-1.6, 1.6, size=(B, 100, 2)).astype(np.float32)
    coords[:, 0] = [-1.0, -1.0]
    coords[:, 1] = [1.0, 1.0]
    coords[:, 2] = [0.0, 0.0]

    got = grid_sample(jnp.asarray(fm), jnp.asarray(coords), padding)

    t_fm = torch.from_numpy(fm).permute(0, 3, 1, 2)
    t_coords = torch.from_numpy(coords)[:, :, None, :]  # (B, N, 1, 2)
    want = F.grid_sample(t_fm, t_coords, mode='bilinear',
                         padding_mode=padding, align_corners=False)
    want = want[..., 0].permute(0, 2, 1).numpy()  # (B, N, C)

    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_pyramid_concat():
    rng = np.random.default_rng(2)
    fms = tuple(jnp.asarray(rng.normal(size=(2, s, s, c)).astype(np.float32))
                for s, c in [(8, 4), (16, 6)])
    coords = jnp.asarray(rng.uniform(-1, 1, size=(2, 10, 2)).astype(np.float32))
    out = grid_sample_pyramid(fms, coords)
    assert out.shape == (2, 10, 10)
    np.testing.assert_allclose(out[..., :4], grid_sample(fms[0], coords),
                               atol=1e-6)
