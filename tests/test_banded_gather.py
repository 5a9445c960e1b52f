"""Banded Pallas gather: parity vs the take-based path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

from cross_attention_renderer_tpu.ops import grid_sample
from cross_attention_renderer_tpu.ops.experimental import banded_gather as BG


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    monkeypatch.setattr(BG, 'SAMPLE_BLOCK', 64)
    monkeypatch.setattr(BG, 'BAND_POSITIONS', 128)


@pytest.mark.parametrize('padding', ['border', 'zeros'])
def test_matches_take_path(padding):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 16, 32
    fm = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.4, 1.4, (B, 100, 2)).astype(np.float32))
    want = grid_sample(fm, coords, padding)
    got = BG.grid_sample_banded(fm, coords, padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_epipolar_like_coords():
    """Line-segment sample patterns (the actual workload shape)."""
    rng = np.random.default_rng(1)
    B, H, W, C, R, P = 1, 32, 32, 16, 20, 16
    fm = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    start = rng.uniform(-1, 1, (B, R, 1, 2))
    end = rng.uniform(-1, 1, (B, R, 1, 2))
    t = np.linspace(0, 1, P)[None, None, :, None]
    coords = jnp.asarray((start + (end - start) * t).reshape(B, R * P, 2)
                         .astype(np.float32))
    want = grid_sample(fm, coords, 'border')
    got = BG.grid_sample_banded(fm, coords, 'border')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_grad_falls_back_to_take():
    rng = np.random.default_rng(2)
    fm = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (1, 10, 2)).astype(np.float32))

    def loss_banded(f):
        return jnp.sum(BG.grid_sample_banded(f, coords, 'border') ** 2)

    def loss_take(f):
        return jnp.sum(grid_sample(f, coords, 'border') ** 2)

    g1 = jax.grad(loss_banded)(fm)
    g2 = jax.grad(loss_take)(fm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-1,
                               rtol=2e-1)
