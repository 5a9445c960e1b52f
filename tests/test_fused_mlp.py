"""Fused 2-layer MLP kernel: interpret-mode parity + gradient fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

from cross_attention_renderer_tpu.ops.experimental import fused_mlp as FM


@pytest.fixture(autouse=True)
def interpret_and_tpu(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    monkeypatch.setattr(FM, '_on_tpu', lambda: True)
    monkeypatch.setattr(FM, 'BLOCK_M', 64)


def _make(seed, M=256, K1=96, K2=3, H=160, O=64):
    rng = np.random.default_rng(seed)
    x1 = jnp.asarray(rng.normal(0, 1, (M, K1)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(0, 1, (M, K2)).astype(np.float32))
    w1a = jnp.asarray(rng.normal(0, 0.1, (K1, H)).astype(np.float32))
    w1b = jnp.asarray(rng.normal(0, 0.1, (K2, H)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (H,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.1, (H, O)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (O,)).astype(np.float32))
    return x1, x2, w1a, w1b, b1, w2, b2


def test_matches_reference():
    args = _make(0)
    got = np.asarray(FM.fused_mlp2(*args))
    want = np.asarray(FM._mlp2_ref(args[0], args[1], *args[2:]))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_non_divisible_m_falls_back():
    args = _make(1, M=100)  # 100 % 64 != 0 -> jnp path
    got = np.asarray(FM.fused_mlp2(*args))
    want = np.asarray(FM._mlp2_ref(args[0], args[1], *args[2:]))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_gradients_match_reference():
    args = _make(2, M=128)

    def loss_fused(*a):
        return jnp.sum(FM.fused_mlp2(*a) ** 2)

    def loss_ref(x1, x2, w1a, w1b, b1, w2, b2):
        return jnp.sum(FM._mlp2_ref(x1, x2, w1a, w1b, b1, w2, b2) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
