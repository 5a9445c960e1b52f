"""Test configuration: run everything on a virtual 8-device CPU mesh.

This gives the multi-device capability the reference lacks (SURVEY.md §4):
shard_map/psum/mesh code paths are exercised on CPU with
``--xla_force_host_platform_device_count=8`` and no TPU in the loop.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel, but tests
# must run on the virtual multi-device CPU backend.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
