"""Driver entry points compile and run (small shapes, CPU mesh)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_single_chip():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (16,)


def test_dryrun_multichip_small():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
