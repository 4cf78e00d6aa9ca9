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


def test_viz_colormaps_and_panels(tmp_path):
    import numpy as np
    from mrp_gnn_tpu.utils.viz import depth_to_rgb, save_panels, seg_to_rgb
    d = depth_to_rgb(np.linspace(0, 20, 64).reshape(8, 8), 0.1, 20.0)
    assert d.shape == (8, 8, 3) and d.dtype == np.uint8
    s = seg_to_rgb(np.arange(64).reshape(8, 8) % 6)
    assert s.shape == (8, 8, 3) and s.dtype == np.uint8
    V, H, W = 3, 8, 8
    paths = save_panels(
        str(tmp_path), np.random.rand(V, H, W, 3).astype(np.float32),
        {"depth": np.random.rand(V, H, W).astype(np.float32) * 20,
         "seg_logits": np.random.rand(V, H, W, 6).astype(np.float32)},
        {"depth": np.random.rand(V, H, W).astype(np.float32) * 20,
         "seg": np.random.randint(0, 6, (V, H, W))},
        np.array([True, True, False]), 0.1, 20.0)
    assert len(paths) == 2  # masked view skipped
    import os
    assert all(os.path.exists(p) for p in paths)
    from PIL import Image
    w, h = Image.open(paths[0]).size
    assert (w, h) == (5 * W, H)  # rgb | d_pred | d_gt | seg_pred | seg_gt


def test_step_timer():
    from mrp_gnn_tpu.utils.profiling import StepTimer
    t = StepTimer()
    t.start()
    rec = t.stop(step=1)
    assert rec["step_time_s"] >= 0 and rec["step"] == 1
