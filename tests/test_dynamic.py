"""Dynamic swarm topology (DataConfig.mobility > 0): per-batch graphs under
static capacities — shapes stable, topology varying, training end-to-end."""

import dataclasses

import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.data.pipeline import augment_scene, make_dataset
from mrp_gnn_tpu.graph import positions_radius_edges


def _tiny_cfg(**data_kw):
    cfg = get_config("dynamic_swarm")
    return cfg.replace(
        model=dataclasses.replace(cfg.model, image_size=(16, 16),
                                  encoder_channels=(8, 16)),
        data=dataclasses.replace(cfg.data, scenes_per_batch=2,
                                 num_train_scenes=6, num_eval_scenes=2,
                                 image_size=(16, 16), **data_kw),
    )


def test_dynamic_stream_static_shapes_varying_topology():
    cfg = _tiny_cfg()
    it = make_dataset(cfg.data, "train", shuffle=False)
    edges, shapes = [], set()
    for b in it:
        g = b["graph"]
        edges.append(int(np.asarray(g.n_edges)))
        shapes.add((np.asarray(g.edge_src).shape, np.asarray(g.ell_src).shape,
                    np.asarray(g.bsp_pair_dst).shape))
    assert len(shapes) == 1, shapes          # one jit compile for the stream
    assert len(set(edges)) > 1, edges        # topology genuinely varies


def test_dynamic_graph_matches_scene_positions():
    cfg = _tiny_cfg()
    ds_it = make_dataset(cfg.data, "train", shuffle=False)
    batch = next(iter(ds_it))
    g = batch["graph"]
    ds = ds_it.ds
    spacing = ds.spec.max_baseline / max(cfg.data.num_robots - 1, 1)
    N = cfg.data.num_robots
    # rebuild the expected edge set from the records' positions
    want_src, want_dst = [], []
    for s, idx in enumerate(range(cfg.data.scenes_per_batch)):
        pos = ds[idx]["positions"] / spacing
        e = positions_radius_edges(pos.astype(np.float64),
                                   cfg.data.comm_radius)
        want_src.append(e[0] + s * N)
        want_dst.append(e[1] + s * N)
    want = set(zip(np.concatenate(want_src).tolist(),
                   np.concatenate(want_dst).tolist()))
    m = np.asarray(g.edge_mask)
    got = set(zip(np.asarray(g.edge_src)[m].tolist(),
                  np.asarray(g.edge_dst)[m].tolist()))
    assert got == want


def test_augment_flip_preserves_dynamic_topology():
    cfg = _tiny_cfg()
    ds = make_dataset(cfg.data, "train", shuffle=False).ds
    rec = ds[0]
    rng = np.random.default_rng(2)  # first uniform() < 0.5 -> flip fires
    assert np.random.default_rng(2).uniform() < 0.5
    out = augment_scene(rec, rng)
    d_in = np.abs(rec["positions"][:, None] - rec["positions"][None, :])
    d_out = np.abs(out["positions"][:, None] - out["positions"][None, :])
    np.testing.assert_allclose(d_out, d_in[::-1, ::-1], atol=1e-6)


def test_dynamic_mobility_validation():
    cfg = _tiny_cfg(connectivity="full", comm_radius=0)
    with pytest.raises(ValueError, match="radius"):
        make_dataset(cfg.data, "train")


def test_dynamic_train_short_run():
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, steps=6, log_every=3, eval_every=0, checkpoint_every=0))
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 6


def test_dynamic_grad_accum_rejected():
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, steps=2, grad_accum_steps=2))
    with pytest.raises(NotImplementedError, match="dynamic topology"):
        train(cfg)


def test_dynamic_partitioned_rejected():
    from mrp_gnn_tpu.parallel.context import make_parallel_context
    from mrp_gnn_tpu.train import replica_graph_for
    cfg = _tiny_cfg()
    cfg = cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, graph_axis_size=2))
    with pytest.raises(NotImplementedError, match="partition"):
        make_parallel_context(cfg, replica_graph_for(cfg))
