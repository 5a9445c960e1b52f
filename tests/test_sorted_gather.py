"""Sorted-stream gather kernels: interpret-mode parity vs the take path.

Covers ``sort_stream`` bookkeeping, the VMEM-resident one-step kernel
(``resident_gather``), the banded windowed kernel, the residual fixup for
adversarial (incoherent) streams, and the custom-VJP gradient fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

from cross_attention_renderer_tpu.ops import grid_sample
from cross_attention_renderer_tpu.ops import sorted_gather as SG


@pytest.fixture(autouse=True)
def interpret_and_tpu(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **kw: orig(*a, interpret=True, **kw))
    monkeypatch.setattr(SG, '_on_tpu', lambda: True)  # exercise the kernels


def _stream(rng, B, N, H, W, lo=-1.2, hi=1.2):
    coords = jnp.asarray(rng.uniform(lo, hi, (B, N, 2)).astype(np.float32))
    return coords, SG.sort_stream(coords, (H, W))


def test_sort_stream_roundtrip():
    rng = np.random.default_rng(0)
    coords, stream = _stream(rng, 3, 50, 16, 16)
    flat = np.asarray(coords).reshape(-1, 2)
    # perm/inv_perm are inverses; coords/image_id ride the perm
    np.testing.assert_array_equal(
        np.asarray(stream.perm)[np.asarray(stream.inv_perm)],
        np.arange(150))
    np.testing.assert_allclose(np.asarray(stream.coords),
                               flat[np.asarray(stream.perm)])
    assert (np.asarray(stream.image_id)
            == (np.asarray(stream.perm) // 50)).all()
    # sorted by (image, row-major pixel)
    ids = np.asarray(stream.image_id)
    assert (np.diff(ids) >= 0).all()


@pytest.mark.parametrize('padding', ['border', 'zeros'])
def test_grid_sample_sorted_matches_take(monkeypatch, padding):
    monkeypatch.setattr(SG, 'SAMPLE_BLOCK', 64)
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 16, 16, 32
    fm = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    coords, stream = _stream(rng, B, 100, H, W)
    want = grid_sample(fm, coords, padding)
    got = SG.unsort(
        SG.grid_sample_sorted(fm, stream.coords, stream.image_id, padding),
        stream).reshape(B, 100, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_resident_gather_residual_path(monkeypatch):
    """Adversarial: unsorted stream whose blocks span the whole table —
    the out-of-window corners must be fixed up exactly by the residual."""
    rng = np.random.default_rng(2)
    HW, C, M = 4096, 16, 512
    fm = jnp.asarray(rng.normal(size=(HW, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, HW - 1, (M, 4)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (M, 4)).astype(np.float32))
    want = np.asarray(SG._take_gather(fm.astype(jnp.bfloat16), idx, w))
    got = np.asarray(SG.resident_gather(fm, idx, w, sample_block=128,
                                        window=256))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_windowed_gather_matches_take(monkeypatch):
    rng = np.random.default_rng(3)
    HW, C, M = 2048, 8, 640
    fm = jnp.asarray(rng.normal(size=(HW, C)).astype(np.float32))
    idx = jnp.sort(jnp.asarray(rng.integers(0, HW - 1, (M, 4)), jnp.int32),
                   axis=0)
    w = jnp.asarray(rng.uniform(0, 1, (M, 4)).astype(np.float32))
    want = np.asarray(SG._take_gather(fm.astype(jnp.bfloat16), idx, w))
    got = np.asarray(SG.windowed_gather(fm, idx, w, sample_block=128,
                                        band=128, max_bands=4))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_gradients_fall_back_to_take():
    rng = np.random.default_rng(4)
    B, H, W, C = 1, 8, 8, 8
    fm = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    coords, stream = _stream(rng, B, 20, H, W)

    def loss_sorted(f):
        out = SG.grid_sample_sorted(f, stream.coords, stream.image_id,
                                    'border')
        return jnp.sum(out ** 2)

    def loss_take(f):
        idx, w = SG._corners_flat(H, W, jnp.float32, stream.coords,
                                  stream.image_id, 'border')
        return jnp.sum(SG._take_gather(f.reshape(H * W, C), idx, w) ** 2)

    g1 = jax.grad(loss_sorted)(fm)
    g2 = jax.grad(loss_take)(fm).reshape(fm.shape)
    # the kernel forward quantizes the table to bf16, so the cotangent
    # (2*out) differs from the f32 reference at bf16 grade
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-2, rtol=2e-2)
