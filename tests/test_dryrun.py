"""CI coverage of the driver entry points (__graft_entry__)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape[-1] == 2048
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dryrun_multichip_4():
    graft.dryrun_multichip(4)
