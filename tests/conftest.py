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
