"""grain-backed input pipeline (data/grain_pipeline.py)."""

import dataclasses

import numpy as np
import pytest

pytest.importorskip("grain")

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.data.grain_pipeline import make_grain_iterator
from mrp_gnn_tpu.data.pipeline import make_dataset
from mrp_gnn_tpu.train import train


def _data(**kw):
    return dataclasses.replace(get_config("two_robot_mean").data,
                               image_size=(16, 16), num_train_scenes=8,
                               num_eval_scenes=4, scenes_per_batch=2, **kw)


def test_grain_matches_builtin_unshuffled():
    cfg = _data()
    g = next(make_grain_iterator(cfg, "train", shuffle=False, num_epochs=1))
    b = next(iter(make_dataset(cfg, "train", shuffle=False)))
    np.testing.assert_allclose(g["images"], b["images"])
    np.testing.assert_allclose(g["depth"], b["depth"])
    assert g["graph"].max_nodes == b["graph"].max_nodes


def test_grain_epoch_has_all_batches_and_repeats():
    cfg = _data()
    it = make_grain_iterator(cfg, "train", shuffle=True, num_epochs=1)
    assert sum(1 for _ in it) == 4
    endless = make_grain_iterator(cfg, "train")
    for _ in range(6):  # crosses the epoch boundary
        batch = next(endless)
    assert batch["images"].shape == (4, 16, 16, 3)


def test_grain_state_seek_matches_sequential():
    """O(1) checkpoint seek: set_state reproduces the exact stream position
    without rendering the skipped batches (VERDICT round 1, item 8)."""
    cfg = _data()
    a = make_grain_iterator(cfg, "train")
    for _ in range(3):
        next(a)
    state = a.get_state()
    expected = next(a)

    b = make_grain_iterator(cfg, "train")
    b.set_state(state)
    got = next(b)
    np.testing.assert_allclose(got["images"], expected["images"])
    np.testing.assert_allclose(got["depth"], expected["depth"])


@pytest.mark.slow
def test_training_through_grain_loader():
    cfg = get_config("two_robot_mean")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, image_size=(16, 16),
                                  encoder_channels=(8, 16)),
        data=_data(loader="grain"),
        train=dataclasses.replace(cfg.train, steps=6, learning_rate=3e-3,
                                  warmup_steps=2, log_every=2))
    _, records = train(cfg)
    losses = [r["total"] for r in records]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
