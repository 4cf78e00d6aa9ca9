"""Disk dataset adapter (data/disk.py) + augmentation (data/pipeline.py)."""

import dataclasses

import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.data.disk import DiskSceneDataset, export_scenes
from mrp_gnn_tpu.data.pipeline import (SceneDataset, augment_scene,
                                       make_dataset)


def _data_cfg(**kw):
    cfg = get_config("multitask_batched").data
    return dataclasses.replace(cfg, image_size=(16, 16), num_robots=3,
                               scenes_per_batch=2, num_train_scenes=4,
                               num_eval_scenes=2, **kw)


@pytest.mark.parametrize("fmt", ["npy", "png"])
def test_export_and_reload_roundtrip(tmp_path, fmt):
    cfg = _data_cfg()
    n = export_scenes(cfg, str(tmp_path), "train", fmt=fmt)
    assert n == 4
    disk = DiskSceneDataset(cfg, "train", root=str(tmp_path))
    synth = SceneDataset(cfg, "train")
    assert len(disk) == len(synth)
    a, b = disk[1], synth[1]
    assert a["images"].shape == b["images"].shape == (3, 16, 16, 3)
    tol = 1e-6 if fmt == "npy" else 1 / 255
    np.testing.assert_allclose(a["images"], b["images"], atol=tol + 1e-7)
    np.testing.assert_allclose(a["depth"], b["depth"])  # depth always .npy
    np.testing.assert_array_equal(a["seg"], b["seg"])


def test_disk_dataset_resizes(tmp_path):
    cfg = _data_cfg()
    export_scenes(cfg, str(tmp_path), "eval", fmt="npy")
    small = dataclasses.replace(cfg, image_size=(8, 8))
    rec = DiskSceneDataset(small, "eval", root=str(tmp_path))[0]
    assert rec["images"].shape == (3, 8, 8, 3)
    assert rec["seg"].dtype == np.int32


def test_disk_dataset_missing_split(tmp_path):
    with pytest.raises(FileNotFoundError):
        DiskSceneDataset(_data_cfg(), "train", root=str(tmp_path))


def test_pipeline_trains_from_disk(tmp_path):
    data = _data_cfg()
    export_scenes(data, str(tmp_path), "train", fmt="npy")
    data = dataclasses.replace(data, dataset_root=str(tmp_path))
    batch = next(iter(make_dataset(data, "train", shuffle=False)))
    synth = next(iter(make_dataset(
        dataclasses.replace(data, dataset_root=""), "train", shuffle=False)))
    np.testing.assert_allclose(batch["images"], synth["images"], atol=1e-6)
    assert batch["graph"].max_nodes == synth["graph"].max_nodes


def test_augment_flip_is_rig_consistent():
    cfg = _data_cfg()
    rec = SceneDataset(cfg, "train")[0]
    # force the flip branch: rng whose first uniform() < 0.5
    rng = np.random.default_rng(3)
    assert np.random.default_rng(3).uniform() < 0.5
    aug = augment_scene(rec, rng)
    # depth/seg are flipped in both robot order and width — geometry intact
    np.testing.assert_array_equal(aug["seg"], rec["seg"][::-1, :, ::-1])
    np.testing.assert_allclose(aug["depth"], rec["depth"][::-1, :, ::-1])
    assert aug["images"].shape == rec["images"].shape
    assert aug["images"].min() >= 0 and aug["images"].max() <= 1


def test_augment_deterministic_per_epoch_and_varies():
    data = dataclasses.replace(_data_cfg(), augment=True)
    it = make_dataset(data, "train", shuffle=False)
    first_a = next(iter(it))
    it2 = make_dataset(data, "train", shuffle=False)
    first_b = next(iter(it2))
    np.testing.assert_array_equal(first_a["images"], first_b["images"])
    # second epoch of the same iterator augments differently
    epoch2 = next(iter(it))
    assert not np.array_equal(first_a["images"], epoch2["images"])
    # eval split is never augmented
    ev = next(iter(make_dataset(data, "eval", shuffle=False)))
    ev2 = next(iter(make_dataset(dataclasses.replace(data, augment=False),
                                 "eval", shuffle=False)))
    np.testing.assert_array_equal(ev["images"], ev2["images"])
