import numpy as np
import pytest

from mrp_gnn_tpu.graph import batch_fully_connected
from mrp_gnn_tpu.utils import debug


def test_validate_graph_ok():
    debug.validate_graph(batch_fully_connected(3, 5))


def test_validate_graph_catches_corruption():
    import dataclasses
    import jax.numpy as jnp
    gb = batch_fully_connected(2, 3)
    bad = dataclasses.replace(gb, edge_src=gb.edge_src.at[0].set(99))
    with pytest.raises(AssertionError):
        debug.validate_graph(bad)


def test_checked_catches_nan():
    import jax
    import jax.numpy as jnp

    def f(x):
        return jnp.log(x)  # NaN for negative input

    run = debug.checked(jax.jit(f))
    out = run(jnp.array([1.0, 2.0]))
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(Exception):
        run(jnp.array([-1.0]))


def test_step_timer():
    from mrp_gnn_tpu.utils.profiling import StepTimer
    t = StepTimer()
    t.start()
    rec = t.stop(step=1)
    assert rec["step_time_s"] >= 0 and rec["step"] == 1
