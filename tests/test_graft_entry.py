"""Driver-contract tests: entry() compiles single-device; the multichip
dryrun executes the data-parallel train step + sharded sampler on the
virtual 8-device mesh.
"""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_compiles() -> None:
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None
    out = fn(*args)
    assert out.shape == args[1].shape


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_dryrun_multichip() -> None:
    graft.dryrun_multichip(8)
