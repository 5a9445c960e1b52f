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


def pytest_sessionstart(session):
    assert jax.default_backend() == 'cpu', 'tests must not touch the TPU'
    assert jax.device_count() == 8, 'expected 8 virtual CPU devices'
