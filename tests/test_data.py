import pytest
import numpy as np

from mrp_gnn_tpu.config import DataConfig
from mrp_gnn_tpu.data.pipeline import SceneDataset, make_dataset
from mrp_gnn_tpu.data.synthetic import SceneSpec, generate_scene


def test_scene_determinism_and_schema():
    spec = SceneSpec(num_robots=3, image_size=(32, 32), num_classes=4)
    a = generate_scene(spec, seed=7, scene_index=2)
    b = generate_scene(spec, seed=7, scene_index=2)
    for k in ("images", "depth", "seg"):
        np.testing.assert_array_equal(a[k], b[k])
    assert a["images"].shape == (3, 32, 32, 3)
    assert a["images"].dtype == np.float32
    assert a["images"].min() >= 0 and a["images"].max() <= 1
    assert a["depth"].shape == (3, 32, 32)
    assert (a["depth"] > 0).all()
    assert a["seg"].shape == (3, 32, 32)
    assert a["seg"].min() >= 0 and a["seg"].max() < 4
    c = generate_scene(spec, seed=7, scene_index=3)
    assert not np.array_equal(a["depth"], c["depth"])


def test_parallax_views_differ_but_share_world():
    spec = SceneSpec(num_robots=5, image_size=(64, 64))
    s = generate_scene(spec, seed=0, scene_index=0)
    # different viewpoints -> different depth maps
    assert not np.array_equal(s["depth"][0], s["depth"][4])
    # but the same set of object depths is visible overall
    d0 = set(np.round(np.unique(s["depth"][0]), 3))
    d4 = set(np.round(np.unique(s["depth"][4]), 3))
    assert len(d0 & d4) >= 3


def test_batch_iterator_shapes_static():
    cfg = DataConfig(num_robots=3, scenes_per_batch=2, image_size=(32, 32),
                     num_train_scenes=7, num_eval_scenes=4)
    it = make_dataset(cfg, "train")
    batches = list(it)
    assert len(batches) == 3  # 7 // 2, remainder dropped
    for b in batches:
        assert b["images"].shape == (6, 32, 32, 3)
        assert b["depth"].shape == (6, 32, 32)
        assert b["seg"].shape == (6, 32, 32)
        assert int(b["graph"].n_nodes) == 6
    # same topology object every step (one jit compile)
    assert batches[0]["graph"] is batches[1]["graph"]


def test_train_eval_splits_disjoint():
    cfg = DataConfig(num_robots=2, scenes_per_batch=2, image_size=(32, 32))
    tr = SceneDataset(cfg, "train")[0]
    ev = SceneDataset(cfg, "eval")[0]
    assert not np.array_equal(tr["depth"], ev["depth"])


def test_shuffle_changes_between_epochs():
    cfg = DataConfig(num_robots=1, scenes_per_batch=1, image_size=(32, 32),
                     num_train_scenes=16)
    it = make_dataset(cfg, "train")
    e1 = [b["depth"].sum() for b in it]
    e2 = [b["depth"].sum() for b in it]
    assert sorted(e1) == sorted(e2)
    assert e1 != e2


def test_per_host_local_batch_matches_full_pipeline():
    """BatchIterator(node_range=[lo,hi)) must yield exactly rows [lo, hi)
    of the full pipeline's batches — same scenes, same graph — including
    dynamic topology (positions for non-local scenes come from the
    render-free scene_positions replay) and augmentation."""
    import dataclasses as dc
    from mrp_gnn_tpu.config import get_config
    from mrp_gnn_tpu.data.pipeline import BatchIterator, SceneDataset

    for preset, mobility in (("two_robot_mean", 0.0), ("dynamic_swarm", 1.5)):
        cfg = get_config(preset).data
        cfg = dc.replace(cfg, scenes_per_batch=4, num_train_scenes=8,
                         image_size=(16, 16), mobility=mobility)
        ds = SceneDataset(cfg, "train")
        full = BatchIterator(ds, 4, shuffle=True, seed=3, augment=True)
        V = full.max_nodes
        lo, hi = V // 2, V  # second half: exercises the non-local replay
        local = BatchIterator(SceneDataset(cfg, "train"), 4, shuffle=True,
                              seed=3, augment=True, node_range=(lo, hi))
        fb = next(iter(full))
        lb = next(iter(local))
        assert lb["node_range"] == (lo, hi)
        for k in ("images", "depth", "seg"):
            np.testing.assert_array_equal(lb[k], fb[k][lo:hi], err_msg=k)
        import jax
        for a, b in zip(jax.tree_util.tree_leaves(lb["graph"]),
                        jax.tree_util.tree_leaves(fb["graph"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transform_iterator_state_aligns_with_consumption():
    """TransformIterator prefetches ahead on its producer thread, but
    get_state() must return the inner iterator's state AS OF the batch most
    recently handed to the consumer — so a checkpoint/restore replays from
    exactly the next unseen batch."""
    import time
    from mrp_gnn_tpu.data.pipeline import TransformIterator

    class Counting:
        def __init__(self):
            self.i = 0

        def __next__(self):
            self.i += 1
            return {"n": self.i}

        def get_state(self):
            return self.i

    inner = Counting()
    it = TransformIterator(inner, lambda b: {**b, "seen": True}, depth=3)
    got = [next(it) for _ in range(3)]
    assert [b["n"] for b in got] == [1, 2, 3]
    assert all(b["seen"] for b in got)
    time.sleep(0.05)  # let the producer run ahead into its queue
    assert inner.i > 3  # it DID run ahead...
    assert it.get_state() == 3  # ...but the state tracks consumption
    it.close()


def test_transform_iterator_relays_exceptions():
    from mrp_gnn_tpu.data.pipeline import TransformIterator

    def gen():
        yield {"n": 1}
        raise RuntimeError("boom")

    it = TransformIterator(gen(), lambda b: b)
    assert next(it)["n"] == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
        next(it)  # depending on timing the error arrives on this pull


def test_transform_iterator_terminal_reraise_no_hang():
    """After the producer relays a terminal exception and exits, repeated
    __next__ calls must keep raising immediately (iterator contract) instead
    of blocking forever on the empty queue (ADVICE r3)."""
    from mrp_gnn_tpu.data.pipeline import TransformIterator

    it = TransformIterator(iter([{"n": 1}]), lambda b: b)
    assert next(it)["n"] == 1
    for _ in range(3):  # every call returns promptly
        with pytest.raises(StopIteration):
            next(it)

    def gen():
        yield {"n": 1}
        raise RuntimeError("boom")

    it2 = TransformIterator(gen(), lambda b: b)
    assert next(it2)["n"] == 1
    for _ in range(3):
        with pytest.raises(RuntimeError, match="boom"):
            next(it2)


def test_transform_iterator_close_cascades_and_joins():
    """close() stops the producer thread (join observable) and cascades to
    an inner iterator that itself has close()."""
    import time
    from mrp_gnn_tpu.data.pipeline import TransformIterator

    class Inner:
        def __init__(self):
            self.closed = False
            self.i = 0

        def __next__(self):
            self.i += 1
            time.sleep(0.001)
            return {"n": self.i}

        def close(self):
            self.closed = True

    inner = Inner()
    it = TransformIterator(inner, lambda b: b, depth=1)
    assert next(it)["n"] == 1
    it.close()
    assert inner.closed
    assert not it._thread.is_alive()
    with pytest.raises(StopIteration):
        next(it)  # closed iterator terminates instead of hanging
