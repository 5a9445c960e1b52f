"""LPIPS architecture tests (random weights — the learned weights ship via
the conversion path; no egress here)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cross_attention_renderer_tpu.losses import lpips as L

@pytest.fixture(scope='module')
def weights(lpips_npz):
    # shared random-weight conversion fixture (tests/conftest.py)
    return lpips_npz


def test_lpips_properties(weights):
    fn = L.load_lpips(str(weights))
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d_aa = np.asarray(fn(a, a))
    d_ab = np.asarray(fn(a, b))
    d_ba = np.asarray(fn(b, a))
    assert d_aa.shape == (2,)
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-6)
    assert (d_ab > 0).all()
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)
    # closer images -> smaller distance
    near = a + 0.01 * (b - a)
    assert (np.asarray(fn(a, near)) < d_ab).all()


def test_missing_weights_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match='LPIPS weights not found'):
        L.load_lpips(str(tmp_path / 'nope.npz'))


def test_lpips_torch_parity(weights):
    """Numerical parity vs a hand-rolled torch replica of the lpips
    package's VGG pipeline (lpips/__init__.py + torchvision VGG16 features)
    with the SAME random weights (VERDICT r1 #7). Pins the conversion and
    the architecture so real weights are trustworthy the day they become
    fetchable."""
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F

    d = dict(np.load(weights))
    rng = np.random.default_rng(3)
    img0 = rng.uniform(-1, 1, (2, 3, 48, 48)).astype(np.float32)
    img1 = rng.uniform(-1, 1, (2, 3, 48, 48)).astype(np.float32)

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    taps_per_block = [2, 2, 3, 3, 3]

    def vgg_taps(x):
        taps, idx = [], 0
        for b, n in enumerate(taps_per_block):
            for _ in range(n):
                w = torch.from_numpy(d[f'conv{idx}_w']).permute(3, 2, 0, 1)
                bias = torch.from_numpy(d[f'conv{idx}_b'])
                x = F.relu(F.conv2d(x, w, bias, padding=1))
                idx += 1
            taps.append(x)
            if b < 4:
                x = F.max_pool2d(x, 2, 2)
        return taps

    def normalize(x, eps=1e-10):
        return x / (torch.sqrt(torch.sum(x ** 2, 1, keepdim=True)) + eps)

    def torch_lpips(a, b):
        a = (torch.from_numpy(a) - shift) / scale
        b = (torch.from_numpy(b) - shift) / scale
        fa, fb = vgg_taps(a), vgg_taps(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            diff = (normalize(x) - normalize(y)) ** 2
            lin = torch.from_numpy(d[f'lin{i}_w']).view(1, -1, 1, 1)
            total = total + (diff * lin).sum(1).mean((1, 2))
        return total.numpy()

    want = torch_lpips(img0, img1)
    fn = L.load_lpips(str(weights))
    got = np.asarray(fn(jnp.asarray(img0.transpose(0, 2, 3, 1)),
                        jnp.asarray(img1.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
