"""Driver entry points stay healthy inside the regular suite."""

import sys

import jax
import pytest


def test_entry_traces():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 16, 40, 64, 4)


def test_dryrun_multichip_on_virtual_mesh():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    g.dryrun_multichip(8)  # raises on failure
