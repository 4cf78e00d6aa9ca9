"""Serving path (mrp_gnn_tpu/serving.py): fixed-shape predictor, portable
StableHLO export/load roundtrip, throughput harness."""

import dataclasses

import jax
import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.models import MultiRobotPerceptionNet
from mrp_gnn_tpu.serving import (Predictor, export_predictor, load_exported,
                                 _scene_graph)


def _tiny_cfg(name="multitask_batched"):
    cfg = get_config(name)
    return cfg.replace(
        model=dataclasses.replace(cfg.model, image_size=(16, 16),
                                  encoder_channels=(8, 16)),
        data=dataclasses.replace(cfg.data, image_size=(16, 16), num_robots=3,
                                 scenes_per_batch=2, num_train_scenes=2,
                                 num_eval_scenes=2),
    )


@pytest.fixture(scope="module")
def pred():
    cfg = _tiny_cfg()
    graph = _scene_graph(cfg)
    model = MultiRobotPerceptionNet(cfg.model)
    images = np.random.default_rng(0).uniform(
        size=(graph.max_nodes, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), images, graph)
    return Predictor(cfg, params), model, params, graph, images


def test_predictor_matches_direct_apply(pred):
    predictor, model, params, graph, images = pred
    out = predictor(images)
    assert set(out) == {"depth", "seg"}
    ref = model.apply(params, images, graph)
    np.testing.assert_allclose(out["depth"], np.asarray(ref["depth"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        out["seg"], np.argmax(np.asarray(ref["seg_logits"]), -1))


def test_predictor_rejects_wrong_shape(pred):
    predictor = pred[0]
    with pytest.raises(ValueError, match="expected images"):
        predictor(np.zeros((1, 16, 16, 3), np.float32))


def test_export_roundtrip(pred, tmp_path):
    predictor, _, _, _, images = pred
    path = str(tmp_path / "model.hlo")
    export_predictor(predictor, path, platforms=("cpu", "tpu"))
    infer = load_exported(path)
    got = infer(images)
    want = predictor(images)
    np.testing.assert_allclose(np.asarray(got["depth"]), want["depth"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["seg"]), want["seg"])
    # metadata sidecar
    import json
    meta = json.load(open(path + ".json"))
    assert meta["input_shape"] == list(predictor.input_shape)
    assert "depth" in meta["outputs"] and "seg" in meta["outputs"]


def test_predict_scenes_chunks_and_strips_padding(pred):
    predictor, _, _, _, images = pred
    # 3 scenes of 3 robots -> 2 compiled batches (capacity 2 scenes each)
    scenes = [np.random.default_rng(i).uniform(
        size=(3, 16, 16, 3)).astype(np.float32) for i in range(3)]
    outs = predictor.predict_scenes(scenes)
    assert len(outs) == 3
    assert outs[0]["depth"].shape == (3, 16, 16)
    # scene 0's result equals running it inside a full batch directly
    flat = np.concatenate([scenes[0], scenes[1]])
    direct = predictor(flat)
    np.testing.assert_allclose(outs[0]["depth"], direct["depth"][:3],
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="each scene"):
        predictor.predict_scenes([np.zeros((2, 16, 16, 3), np.float32)])


def test_throughput_harness(pred):
    predictor = pred[0]
    res = predictor.throughput(iters=2)
    assert res["views_per_s"] > 0 and np.isfinite(res["views_per_s"])
    assert res["scenes_per_s"] * 3 == pytest.approx(res["views_per_s"])
