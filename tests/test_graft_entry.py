"""Driver-contract tests: __graft_entry__ must keep compiling and running.

These mirror exactly what the round driver does (compile-check entry()
single-chip; run dryrun_multichip on virtual devices), so a regression here
is a broken round, not just a broken test.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Replicate the driver: call dryrun_multichip from a process whose jax
    backend is ALREADY initialized with a single device (round-1 failure
    mode, MULTICHIP_r01.json). dryrun_multichip must self-provision the
    virtual mesh in a child process and succeed anyway.

    Deliberately does NOT rely on conftest.py's CPU forcing: the
    intermediate process gets a clean env with exactly one device.
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', '_CAR_DRYRUN_CHILD')}
    env['JAX_PLATFORMS'] = 'cpu'  # 1 CPU device = the driver's 1 axon device
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run([sys.executable, '-c', code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]


@pytest.mark.slow
@pytest.mark.parametrize('n', [2])
def test_dryrun_multichip_small(n):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.shape == (1, 1, 1024, 3)
