"""Tensor parallelism (mesh "model" axis, parallel/tp.py): sharding rule and
end-to-end parity vs the unsharded run on 8 virtual CPU devices
(SURVEY.md section 2.3 "TP")."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.parallel.tp import leaf_partition_spec
from mrp_gnn_tpu.train import train


def test_leaf_partition_spec_rule():
    # conv HWIO kernel: shard out channels
    assert leaf_partition_spec((3, 3, 16, 32), 2) == P(None, None, None, "model")
    # dense (in, out)
    assert leaf_partition_spec((64, 128), 4) == P(None, "model")
    # bias / norm scale vectors follow their parameter
    assert leaf_partition_spec((32,), 2) == P("model")
    # non-divisible or tiny trailing dims stay replicated
    assert leaf_partition_spec((3, 3, 16, 1), 2) == P()
    assert leaf_partition_spec((2,), 2) == P()
    # scalars / trivial axis
    assert leaf_partition_spec((), 2) == P()
    assert leaf_partition_spec((64, 128), 1) == P()


def _tiny(cfg_name, steps, data_ax=1, graph_ax=1, model_ax=1, **data_kw):
    cfg = get_config(cfg_name)
    data = dataclasses.replace(cfg.data, image_size=(16, 16),
                               num_train_scenes=8, num_eval_scenes=4,
                               scenes_per_batch=4, **data_kw)
    model = dataclasses.replace(cfg.model, image_size=(16, 16),
                                encoder_channels=(8, 16))
    tr = dataclasses.replace(cfg.train, steps=steps, learning_rate=3e-3,
                             warmup_steps=2, log_every=1)
    par = dataclasses.replace(cfg.parallel, data_axis_size=data_ax,
                              graph_axis_size=graph_ax,
                              model_axis_size=model_ax)
    return cfg.replace(data=data, model=model, train=tr, parallel=par)


def _losses(cfg, steps=4):
    _, records = train(cfg, num_steps=steps)
    return np.array([r["total"] for r in records])


@pytest.mark.parametrize("axes", [
    (1, 1, 2),  # default tier; the wider meshes are the slow tier
    pytest.param((2, 1, 2), marks=pytest.mark.slow),
    pytest.param((1, 1, 4), marks=pytest.mark.slow)])
def test_tp_matches_unsharded_training(axes):
    data_ax, graph_ax, model_ax = axes
    base = _losses(_tiny("single_robot_depth", 4))
    tp = _losses(_tiny("single_robot_depth", 4, data_ax, graph_ax, model_ax))
    np.testing.assert_allclose(tp, base, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_tp_composes_with_graph_partitioning():
    # 3D mesh: data x graph x model all non-trivial, attention fusion.
    base = _losses(_tiny("multitask_batched", 3, num_robots=4))
    combo = _losses(_tiny("multitask_batched", 3, data_ax=2, graph_ax=2,
                          model_ax=2, num_robots=4))
    np.testing.assert_allclose(combo, base, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_multihead_composes_with_partitioned_fusion():
    # attention_heads > 1 vmaps the shard_map edge block per head; the
    # 3-axis-mesh run must match single-device training.
    def with_heads(cfg):
        return cfg.replace(model=dataclasses.replace(cfg.model,
                                                     attention_heads=2))
    base = _losses(with_heads(_tiny("multitask_batched", 3, num_robots=4)))
    part = _losses(with_heads(_tiny("multitask_batched", 3, data_ax=2,
                                    graph_ax=2, model_ax=2, num_robots=4)))
    np.testing.assert_allclose(part, base, rtol=5e-4, atol=5e-5)


def test_tp_params_are_actually_sharded():
    cfg = _tiny("single_robot_depth", 1, model_ax=2)
    from mrp_gnn_tpu.data.pipeline import make_train_iterator
    from mrp_gnn_tpu.train import create_train_state, make_parallel
    it = make_train_iterator(cfg.data)
    batch = next(it)
    pctx = make_parallel(cfg)
    assert pctx is not None
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = pctx.shard_state(state)
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(state.params)
        if getattr(x.sharding, "spec", P())[-1:] == ("model",)]
    assert sharded_leaves, "no parameter ended up model-sharded"
