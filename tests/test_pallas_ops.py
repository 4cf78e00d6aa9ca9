"""Pallas kernel tests (interpret mode on CPU) vs the XLA oracles
(SURVEY.md section 4.2: interpret-mode tests, gradient checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.graph import batch_fully_connected
from mrp_gnn_tpu.models.fusion import default_edge_fusion
from mrp_gnn_tpu.ops import dispatch, reference as R
from mrp_gnn_tpu.ops import pallas_edge as P


def _inputs(scenes, robots, D=256, dk=64, seed=0, max_nodes=None):
    gb = batch_fully_connected(scenes, robots, max_nodes=max_nodes)
    V = gb.max_nodes
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    return gb, q, k, v


def test_graph_block_metadata():
    gb = batch_fully_connected(4, 8)
    assert gb.scene_stride == 8
    adj = np.asarray(gb.scene_adj)
    assert adj.shape == (8, 8)
    assert adj.sum() == 56 and np.diag(adj).sum() == 0
    # heterogeneous batches carry no block layout
    from mrp_gnn_tpu.graph import build_graph_batch, fully_connected_edges
    gb2 = build_graph_batch([fully_connected_edges(2), fully_connected_edges(3)],
                            [2, 3], 5, 8)
    assert gb2.scene_stride == 0


def test_xla_block_path_matches_sparse():
    gb, q, k, v = _inputs(4, 8)
    sparse = default_edge_fusion(dispatch.get_ops("xla"), "attention",
                                 q, k, v, gb)
    # force the sparse path by stripping the block metadata
    import dataclasses
    gb_sparse = dataclasses.replace(gb, scene_adj=None, scene_stride=0)
    sparse2 = default_edge_fusion(dispatch.get_ops("xla"), "attention",
                                  q, k, v, gb_sparse)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(sparse2),
                               rtol=1e-5, atol=1e-5)


def test_xla_block_mean_matches_sparse():
    gb, _, _, v = _inputs(3, 8, D=128)
    a = R.block_mean_agg(v, gb)
    b = R.segment_mean_agg(v, gb.edge_src, gb.edge_dst, gb.max_nodes,
                           gb.edge_mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scenes,robots,D", [(16, 8, 256), (4, 8, 512),
                                             (8, 4, 128), (3, 5, 256)])
def test_pallas_block_attention_matches_oracle(scenes, robots, D):
    gb, q, k, v = _inputs(scenes, robots, D=D)
    expected = R.block_fused_attention(q, k, v, gb)
    got = P.block_fused_attention(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_pallas_block_attention_padded_nodes():
    # trailing padding: 3 scenes of 8 in a 40-slot batch (5 blocks)
    gb, q, k, v = _inputs(3, 8, D=256, max_nodes=40)
    assert gb.scene_stride == 8
    expected = R.block_fused_attention(q, k, v, gb)
    got = P.block_fused_attention(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got)[24:] == 0)


def test_pallas_block_attention_gradients_match_oracle():
    gb, q, k, v = _inputs(4, 8, D=128)

    def loss_ref(q, k, v):
        return jnp.sum(R.block_fused_attention(q, k, v, gb) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(P.block_fused_attention(q, k, v, gb) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_backend_through_model_fusion():
    """The ops_impl="pallas" backend must work end-to-end in the model."""
    from mrp_gnn_tpu.config import get_config
    from mrp_gnn_tpu.models import MultiRobotPerceptionNet
    import dataclasses as dc

    cfg = get_config("five_robot_attention")
    cfg = cfg.replace(model=dc.replace(cfg.model, image_size=(32, 32),
                                       encoder_channels=(8, 16)))
    gb = batch_fully_connected(2, 5)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(10, 32, 32, 3)).astype(np.float32))

    m_x = MultiRobotPerceptionNet(cfg.model, ops_impl="xla")
    m_p = MultiRobotPerceptionNet(cfg.model, ops_impl="pallas")
    params = m_x.init(jax.random.PRNGKey(0), images, gb)
    out_x = m_x.apply(params, images, gb)
    out_p = m_p.apply(params, images, gb)
    np.testing.assert_allclose(np.asarray(out_p["depth"]),
                               np.asarray(out_x["depth"]),
                               rtol=1e-4, atol=1e-4)
