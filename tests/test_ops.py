"""Oracle tests for the XLA reference ops: dense-math equivalence,
padding invariance, and gradient checks (SURVEY.md section 4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.graph import batch_fully_connected
from mrp_gnn_tpu.ops import reference as R


def dense_attention_fusion(q, k, v, adj):
    """Dense per-scene oracle mirroring the reference's N x N attention
    (SURVEY.md section 3.3): scores -> masked softmax -> weighted sum."""
    scores = q @ k.T  # [N, N] scores[i, j] = <q_i, k_j>
    scores = np.where(adj > 0, scores, -np.inf)
    m = np.max(scores, axis=1, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    e = np.exp(scores - m) * (adj > 0)
    denom = e.sum(1, keepdims=True)
    alpha = e / np.where(denom > 0, denom, 1.0)
    return alpha @ v


@pytest.mark.parametrize("n_robots", [2, 3, 5])
def test_sparse_matches_dense_attention(n_robots):
    rng = np.random.default_rng(0)
    D = 7
    gb = batch_fully_connected(1, n_robots)
    V = gb.max_nodes
    q = rng.normal(size=(V, D)).astype(np.float32)
    k = rng.normal(size=(V, D)).astype(np.float32)
    v = rng.normal(size=(V, 5)).astype(np.float32)

    logits = R.sddmm(jnp.asarray(q), jnp.asarray(k), gb.edge_src, gb.edge_dst,
                     gb.edge_mask)
    alpha = R.segment_softmax(logits, gb.edge_dst, V, gb.edge_mask)
    out = R.spmm(alpha, jnp.asarray(v), gb.edge_src, gb.edge_dst, V, gb.edge_mask)

    adj = 1 - np.eye(n_robots)
    expected = dense_attention_fusion(q, k, v, adj)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_padding_invariance():
    """Adding padded node/edge slots never changes valid outputs."""
    rng = np.random.default_rng(1)
    D = 4
    tight = batch_fully_connected(2, 3)
    padded = batch_fully_connected(2, 3, max_nodes=17, max_edges=33)
    x = rng.normal(size=(6, D)).astype(np.float32)

    def run(gb, V):
        xv = jnp.zeros((V, D)).at[:6].set(x)
        logits = R.sddmm(xv, xv, gb.edge_src, gb.edge_dst, gb.edge_mask)
        alpha = R.segment_softmax(logits, gb.edge_dst, V, gb.edge_mask)
        return R.spmm(alpha, xv, gb.edge_src, gb.edge_dst, V, gb.edge_mask)

    a = run(tight, tight.max_nodes)
    b = run(padded, padded.max_nodes)
    np.testing.assert_allclose(np.asarray(a)[:6], np.asarray(b)[:6],
                               rtol=1e-6, atol=1e-6)
    # padded destinations aggregate to exactly zero
    assert np.all(np.asarray(b)[6:] == 0)


def test_segment_softmax_all_masked_segment_is_zero_not_nan():
    logits = jnp.array([1.0, 2.0, 3.0])
    seg = jnp.array([0, 0, 1])
    mask = jnp.array([True, True, False])
    w = R.segment_softmax(logits, seg, 3, mask)
    assert np.isfinite(np.asarray(w)).all()
    np.testing.assert_allclose(np.asarray(w)[2], 0.0)
    np.testing.assert_allclose(np.asarray(w)[:2].sum(), 1.0, rtol=1e-6)


def test_segment_softmax_sums_to_one_per_valid_segment():
    gb = batch_fully_connected(3, 4, max_edges=64)
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 50)
    w = R.segment_softmax(logits, gb.edge_dst, gb.max_nodes, gb.edge_mask)
    sums = jax.ops.segment_sum(w, gb.edge_dst, num_segments=gb.max_nodes)
    valid = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(sums)[valid], 1.0, rtol=1e-5)


def test_segment_mean_agg():
    gb = batch_fully_connected(1, 3)
    x = jnp.asarray(np.arange(9, dtype=np.float32).reshape(3, 3))
    out = R.segment_mean_agg(x, gb.edge_src, gb.edge_dst, 3, gb.edge_mask)
    # node 0 aggregates mean of nodes 1, 2
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(x[1:]).mean(0))


def test_gradients_flow_and_check():
    gb = batch_fully_connected(1, 3)
    V = gb.max_nodes
    rng = np.random.default_rng(3)

    def loss(q, k, v):
        logits = R.sddmm(q, k, gb.edge_src, gb.edge_dst, gb.edge_mask)
        alpha = R.segment_softmax(logits, gb.edge_dst, V, gb.edge_mask)
        out = R.spmm(alpha, v, gb.edge_src, gb.edge_dst, V, gb.edge_mask)
        return jnp.sum(out ** 2)

    from jax.test_util import check_grads
    with jax.enable_x64():
        q = jnp.asarray(rng.normal(size=(V, 4)))
        k = jnp.asarray(rng.normal(size=(V, 4)))
        v = jnp.asarray(rng.normal(size=(V, 4)))
        assert q.dtype == jnp.float64
        check_grads(loss, (q, k, v), order=1, modes=("rev",), atol=1e-4, rtol=1e-4)


def test_max_aggregation_all_paths_agree():
    """Segment-max (the tier's third reduction) agrees across block-dense,
    ELL, and edge-list forms on both backends."""
    import dataclasses as dc
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch
    gb_block = batch_fully_connected(2, 8)
    gb_ell = dc.replace(gb_block, scene_adj=None, scene_stride=0)
    gb_edge = dc.replace(gb_ell, ell_src=None, ell_mask=None,
                         bsp_pair_dst=None, bsp_pair_src=None,
                         bsp_pair_first=None, bsp_pair_last=None,
                         bsp_pair_dst_t=None, bsp_pair_src_t=None,
                         bsp_pair_first_t=None, bsp_pair_last_t=None,
                         bsp_tile=0)
    V = gb_block.max_nodes
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(V, 12)).astype(np.float32))
    outs = []
    for impl in ("xla", "pallas"):
        ops = dispatch.get_ops(impl)
        for gb in (gb_block, gb_ell, gb_edge):
            outs.append(np.asarray(default_edge_fusion(
                ops, "max", None, None, v, gb)))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-5, atol=1e-5)
