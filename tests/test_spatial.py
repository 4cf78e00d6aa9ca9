"""Spatial (image-H) activation sharding over the "model" axis — the SP
analog for dense feature maps (SURVEY.md section 2.3 "SP/CP"). GSPMD
inserts the conv halo exchanges; training must match the unsharded run."""

import dataclasses

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.train import make_parallel, train


def _cfg(steps=3, **par_kw):
    cfg = get_config("two_robot_mean")
    data = dataclasses.replace(cfg.data, image_size=(16, 16),
                               num_train_scenes=8, num_eval_scenes=2,
                               scenes_per_batch=4)
    model = dataclasses.replace(cfg.model, image_size=(16, 16),
                                encoder_channels=(8, 16))
    tr = dataclasses.replace(cfg.train, steps=steps, learning_rate=3e-3,
                             warmup_steps=2, log_every=1)
    par = dataclasses.replace(cfg.parallel, **par_kw)
    return cfg.replace(data=data, model=model, train=tr, parallel=par)


def _losses(cfg):
    _, records = train(cfg)
    return np.array([r["total"] for r in records])


@pytest.mark.slow
def test_spatial_sharding_matches_unsharded():
    base = _losses(_cfg())
    spatial = _losses(_cfg(data_axis_size=2, model_axis_size=4,
                           spatial_sharding=True))
    np.testing.assert_allclose(spatial, base, rtol=2e-4, atol=2e-5)


def test_spatial_batch_placement():
    cfg = _cfg(model_axis_size=4, spatial_sharding=True)
    pctx = make_parallel(cfg)
    from mrp_gnn_tpu.data.pipeline import make_dataset
    batch = next(iter(make_dataset(cfg.data, "train", shuffle=False)))
    sharded = pctx.shard_batch(batch)
    assert sharded["images"].sharding.spec == P(("data", "graph"), "model")
    assert sharded["depth"].sharding.spec == P(("data", "graph"), "model")
    # params stay replicated under spatial mode
    import jax
    from mrp_gnn_tpu.train import create_train_state
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = pctx.shard_state(state)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.spec == P()
