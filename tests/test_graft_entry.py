"""Driver entry points: single-chip forward compile and the 8-device
multichip dry run (cold-cache-proof since r04: bare-step pjit, ~2 min
for both family stages on this 1-core host; see __graft_entry__.py)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from the fast tier (-m "not heavy")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally on mesh size + metrics
