"""Test configuration: run everything on a virtual 8-device CPU mesh.

This gives the multi-device capability the reference lacks (SURVEY.md §4):
shard_map/psum/mesh code paths are exercised on CPU with
``--xla_force_host_platform_device_count=8`` and no TPU in the loop.

NOTE: the session environment pins JAX to the 'axon' TPU-tunnel platform and
that plugin ignores the ``JAX_PLATFORMS`` env var, so the platform must be
forced through ``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent XLA compilation cache: the suite is compile-dominated (tiny
# shapes, heavy programs), so re-runs skip most of the ~30 min of CPU
# compiles. Keyed on program HLO — source changes that alter a program
# recompile exactly that program.
_cache_dir = os.environ.get('CAR_TEST_COMPILE_CACHE',
                            '/tmp/car_tpu_test_xla_cache')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def pytest_sessionstart(session):
    assert jax.default_backend() == 'cpu', 'tests must not touch the TPU'
    assert jax.device_count() == 8, 'expected 8 virtual CPU devices'


import numpy as np  # noqa: E402
import pytest  # noqa: E402

# VGG16 'D' feature-stack conv layout (torchvision indices / channels).
_VGG_LAYER_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
                 512]


@pytest.fixture(scope='session')
def lpips_npz(tmp_path_factory):
    """Random-weight LPIPS npz through the real conversion path (the learned
    blobs are unfetchable here; architecture parity is pinned by
    test_lpips.py's torch oracle)."""
    from cross_attention_renderer_tpu.losses import lpips as L
    rng = np.random.default_rng(0)
    vgg_state, in_ch = {}, 3
    for lid, ch in zip(_VGG_LAYER_IDS, _VGG_CHANNELS):
        vgg_state[f'{lid}.weight'] = rng.normal(
            0, 0.05, (ch, in_ch, 3, 3)).astype(np.float32)
        vgg_state[f'{lid}.bias'] = np.zeros(ch, np.float32)
        in_ch = ch
    lpips_state = {
        f'lins.{i}.model.1.weight': np.abs(rng.normal(
            0, 1, (1, c, 1, 1))).astype(np.float32)
        for i, c in enumerate([64, 128, 256, 512, 512])}
    out = tmp_path_factory.mktemp('lpips_w') / 'lpips_vgg.npz'
    L.convert_weights(vgg_state, lpips_state, out)
    return out
