"""Pallas one-hot-matmul gather: parity vs the take-based grid_sample
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

from cross_attention_renderer_tpu.ops import grid_sample
from cross_attention_renderer_tpu.ops import pallas_gather as PG


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))


@pytest.mark.parametrize('padding', ['border', 'zeros'])
def test_matches_take_path(padding):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 16, 32
    fm = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.4, 1.4, (B, 77, 2)).astype(
        np.float32))
    want = grid_sample(fm, coords, padding)
    got = PG.grid_sample_pallas(fm, coords, padding)
    # bf16 selector/table: tolerance is bf16-level relative to |fm|~1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_sample_block_sizing():
    # power of two, bounded VMEM footprint
    for hw in (4096, 16384, 65536):
        s = PG._sample_block(hw)
        assert s & (s - 1) == 0
        assert 8 <= s <= 256
        assert s * hw * 6 <= 3 * 1024 * 1024  # iota + selector budget
