"""Native C++ npz loader: parity with numpy + cv2 pipeline, and throughput."""

import time

import numpy as np
import pytest

from cross_attention_renderer_tpu.data import native_loader


@pytest.fixture(scope='module')
def npz_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    frames = {f'{1000 * i}.png': rng.integers(0, 255, (256, 455, 3),
                                              dtype=np.uint8)
              for i in range(12)}
    # include a 360p frame to exercise the pre-resize path
    frames['99000.png'] = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
    p = tmp_path_factory.mktemp('npz') / 'data.npz'
    np.savez(p, **frames)
    return p, frames


@pytest.mark.skipif(not native_loader.available(),
                    reason='no native toolchain')
def test_entries_and_exact_decode(npz_path):
    path, frames = npz_path
    z = native_loader.NativeNpz(path)
    assert sorted(z.keys()) == sorted(frames.keys())
    # crop-only path (256x455 -> center square 256x256): must be exact
    out = z.load_frames(['0.png'], out_hw=(256, 256), square_crop=True)
    ref = frames['0.png']
    m = 256
    cx = 455 // 2
    ref_crop = ref[:, cx - m // 2:cx + m // 2]
    ref_norm = ref_crop.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out[0], ref_norm, atol=1e-6)


@pytest.mark.skipif(not native_loader.available(),
                    reason='no native toolchain')
def test_resize_matches_cv2(npz_path):
    cv2 = pytest.importorskip('cv2')
    path, frames = npz_path
    z = native_loader.NativeNpz(path)
    out = z.load_frames(['99000.png'], out_hw=(256, 256),
                        resize_hw=(256, 455), square_crop=True)
    ref = cv2.resize(frames['99000.png'], (455, 256))
    m = 256
    cx = 455 // 2
    ref = ref[:, cx - m // 2:cx + m // 2].astype(np.float32) / 127.5 - 1.0
    # bilinear implementations may differ by 1 LSB of u8
    assert np.abs(out[0] - ref).max() <= (1.5 / 127.5)


@pytest.mark.skipif(not native_loader.available(),
                    reason='no native toolchain')
def test_batch_parallel_decode(npz_path):
    path, frames = npz_path
    z = native_loader.NativeNpz(path)
    names = [k for k in z.keys() if k != '99000.png']
    t0 = time.perf_counter()
    out = z.load_frames(names, out_hw=(256, 256), n_threads=8)
    dt = time.perf_counter() - t0
    assert out.shape == (len(names), 256, 256, 3)
    assert np.isfinite(out).all() and -1 <= out.min() and out.max() <= 1
    # sanity: 12 frames well under a second natively
    assert dt < 2.0
