"""Native C++ renderer + prefetch pipeline tests."""

import numpy as np
import pytest

from mrp_gnn_tpu.config import DataConfig
from mrp_gnn_tpu.data import native
from mrp_gnn_tpu.data.pipeline import make_dataset, make_train_iterator
from mrp_gnn_tpu.data.synthetic import SceneSpec, generate_scene

needs_native = pytest.mark.skipif(not native.is_available(),
                                  reason="g++ toolchain unavailable")


@needs_native
def test_native_geometry_matches_numpy_exactly():
    spec = SceneSpec(num_robots=4, image_size=(32, 32))
    a = native.render_scene_native(spec, 5, 11)
    b = generate_scene(spec, 5, 11)
    np.testing.assert_array_equal(a["depth"], b["depth"])
    np.testing.assert_array_equal(a["seg"], b["seg"])
    # images share geometry; only the 0.02-std sensor noise differs
    assert np.abs(a["images"] - b["images"]).mean() < 0.05
    assert a["images"].min() >= 0 and a["images"].max() <= 1


@needs_native
def test_native_deterministic():
    spec = SceneSpec(num_robots=3, image_size=(32, 32))
    a = native.render_scene_native(spec, 1, 2)
    b = native.render_scene_native(spec, 1, 2)
    for k in ("images", "depth", "seg"):
        np.testing.assert_array_equal(a[k], b[k])


def test_renderer_config_selects_backend():
    cfg = DataConfig(num_robots=2, scenes_per_batch=1, image_size=(16, 16),
                     num_train_scenes=2, renderer="numpy")
    ds = make_dataset(cfg, "train")
    assert not ds.ds._use_native
    if native.is_available():
        cfg2 = DataConfig(num_robots=2, scenes_per_batch=1,
                          image_size=(16, 16), num_train_scenes=2,
                          renderer="native")
        assert make_dataset(cfg2, "train").ds._use_native


def test_prefetch_iterator_stream():
    cfg = DataConfig(num_robots=2, scenes_per_batch=2, image_size=(16, 16),
                     num_train_scenes=4, prefetch=2)
    it = make_train_iterator(cfg)
    batches = [next(it) for _ in range(5)]  # crosses an epoch boundary
    for b in batches:
        assert b["images"].shape == (4, 16, 16, 3)
    it.close()


def test_prefetch_zero_is_synchronous():
    cfg = DataConfig(num_robots=2, scenes_per_batch=2, image_size=(16, 16),
                     num_train_scenes=4, prefetch=0)
    it = make_train_iterator(cfg)
    assert next(it)["images"].shape == (4, 16, 16, 3)
