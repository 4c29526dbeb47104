import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_entry_is_differentiable():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    g = jax.grad(lambda p: fn(p, *args[1:]))(args[0])
    total = sum(float(jax.numpy.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
