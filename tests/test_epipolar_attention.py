"""Fused epipolar attention kernel: parity vs the jnp reference (interpret
mode on CPU) + gradient path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cross_attention_renderer_tpu.ops.epipolar_attention as EA


def _data(B=2, V=2, R=100, P=16, D=32, C=40, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, V, R, P, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, V, R, P, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, V, R, P, C)).astype(np.float32))
    return q, k, v


def test_kernel_matches_reference(monkeypatch):
    # interpret mode: the kernel runs on CPU through the Pallas interpreter
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    q, k, v = _data()
    out_ref, wt_ref = EA.epipolar_attention_reference(q, k, v)
    out, wt = EA._forward_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wt), np.asarray(wt_ref),
                               atol=1e-6)


def test_reference_softmax_normalization():
    q, k, v = _data(R=7)
    _, wt = EA.epipolar_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(wt).sum((1, 3)), 1.0, atol=1e-5)


def test_custom_vjp_matches_reference_grad(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    q, k, v = _data(B=1, R=12, P=8, D=16, C=24)

    def loss_fused(q, k, v):
        out, wt = EA.epipolar_attention(q, k, v)
        return jnp.sum(out ** 2) + jnp.sum(wt ** 3)

    def loss_ref(q, k, v):
        out, wt = EA.epipolar_attention_reference(q, k, v)
        return jnp.sum(out ** 2) + jnp.sum(wt ** 3)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
