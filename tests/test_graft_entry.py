"""Driver-contract tests: __graft_entry__ must keep compiling and running.

These mirror exactly what the round driver does (compile-check entry()
single-chip; run dryrun_multichip on virtual devices), so a regression here
is a broken round, not just a broken test.
"""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize('n', [2])
def test_dryrun_multichip_small(n):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.shape == (1, 1, 1024, 3)
