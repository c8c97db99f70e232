"""Multi-device sharding on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax

from poreover_tpu.parallel.sharding import make_mesh


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (8, 1000, 5)
    assert np.allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)


def test_merge_stats():
    from poreover_tpu.parallel.sharding import merge_stats

    mesh = make_mesh(8)
    out = merge_stats({"reads": 10, "bases": 1000}, mesh)
    assert np.isclose(out["reads"], 10)
    assert np.isclose(out["bases"], 1000)
