"""Coverage extensions: bf16 compute, multi-layer fusion, partitioned
training/eval end-to-end, sharded checkpoint roundtrip, TensorBoard writer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.graph import batch_fully_connected
from mrp_gnn_tpu.models import MultiRobotPerceptionNet
from mrp_gnn_tpu.train import train


def _tiny(cfg_name, steps=10, **model_kw):
    cfg = get_config(cfg_name)
    data = dataclasses.replace(cfg.data, image_size=(16, 16),
                               num_train_scenes=8, num_eval_scenes=4,
                               scenes_per_batch=2)
    model = dataclasses.replace(cfg.model, image_size=(16, 16),
                                encoder_channels=(8, 16), **model_kw)
    tr = dataclasses.replace(cfg.train, steps=steps, learning_rate=3e-3,
                             warmup_steps=2, log_every=max(steps // 2, 1))
    return cfg.replace(data=data, model=model, train=tr)


@pytest.mark.slow
def test_bf16_model_trains():
    cfg = _tiny("five_robot_attention", steps=20, dtype="bfloat16")
    _, records = train(cfg)
    losses = [r["total"] for r in records]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bf16_outputs_are_float32():
    cfg = _tiny("multitask_batched", dtype="bfloat16")
    gb = batch_fully_connected(1, cfg.data.num_robots)
    model = MultiRobotPerceptionNet(cfg.model)
    imgs = jnp.ones((gb.max_nodes, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), imgs, gb)
    out = model.apply(params, imgs, gb)
    assert out["depth"].dtype == jnp.float32
    assert out["seg_logits"].dtype == jnp.float32


def test_multi_layer_fusion_trains():
    cfg = _tiny("five_robot_attention", steps=12, num_fusion_layers=3)
    _, records = train(cfg)
    assert np.isfinite([r["total"] for r in records]).all()
    assert records[-1]["total"] < records[0]["total"] * 1.2


@pytest.mark.slow
def test_partitioned_train_then_eval(tmp_path):
    """Config-5 style: train 4 steps partitioned over 8 devices with
    checkpointing, then restore and evaluate with the partitioned path."""
    from mrp_gnn_tpu.evaluate import evaluate
    from mrp_gnn_tpu.train import make_parallel

    cfg = get_config("swarm_partitioned")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, image_size=(16, 16),
                                  encoder_channels=(8, 16)),
        data=dataclasses.replace(cfg.data, num_robots=16, scenes_per_batch=2,
                                 image_size=(16, 16), num_train_scenes=4,
                                 num_eval_scenes=2, comm_radius=3),
        train=dataclasses.replace(cfg.train, steps=4, log_every=2,
                                  checkpoint_dir=str(tmp_path / "ck"),
                                  checkpoint_every=4),
        parallel=dataclasses.replace(cfg.parallel, graph_axis_size=8),
    )
    state, records = train(cfg)
    assert np.isfinite([r["total"] for r in records]).all()

    pctx = make_parallel(cfg)
    res = evaluate(cfg, state.params, pctx=pctx)
    for k in ("rmse", "miou"):
        assert np.isfinite(res[k]), res

    # sharded-state checkpoint roundtrip: resume 2 more steps
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, steps=6))
    state2, _ = train(cfg2)
    assert int(state2.step) == 6


@pytest.mark.slow
def test_tensorboard_writer(tmp_path):
    cfg = _tiny("single_robot_depth", steps=4)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, tensorboard_dir=str(tmp_path / "tb")))
    train(cfg)
    import os
    files = []
    for root, _, fs in os.walk(tmp_path / "tb"):
        files += fs
    assert any("tfevents" in f for f in files), files


@pytest.mark.slow
def test_depth_loss_variants_train():
    for loss in ("berhu", "silog"):
        cfg = _tiny("single_robot_depth", steps=10)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, depth_loss=loss))
        _, records = train(cfg)
        key = f"depth_{loss}"
        assert key in records[0], records[0]
        assert np.isfinite([r["total"] for r in records]).all()


def test_iterator_fast_forward_matches_continuous():  # noqa: uses make_train_iterator
    from mrp_gnn_tpu.config import DataConfig
    from mrp_gnn_tpu.data.pipeline import make_dataset, make_train_iterator
    cfg = dataclasses.replace(
        DataConfig(num_robots=2, scenes_per_batch=2, image_size=(16, 16),
                   num_train_scenes=6, prefetch=0))
    it = make_train_iterator(cfg)
    stream = [next(it)["depth"].sum() for _ in range(7)]
    it2 = make_train_iterator(cfg, start_batch=4)
    resumed = [next(it2)["depth"].sum() for _ in range(3)]
    np.testing.assert_allclose(resumed, stream[4:7])
