"""ELL layout + Pallas ELL kernels vs XLA oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.graph import batch_fully_connected, batch_homogeneous, radius_edges
from mrp_gnn_tpu.ops import pallas_ell as PE
from mrp_gnn_tpu.ops import reference as R


def _inputs(gb, D=64, dk=32, seed=0):
    V = gb.max_nodes
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    return q, k, v


def test_ell_layout_matches_edge_list():
    gb = batch_homogeneous(2, 8, radius_edges(8, 2))
    src = np.asarray(gb.edge_src)[np.asarray(gb.edge_mask)]
    dst = np.asarray(gb.edge_dst)[np.asarray(gb.edge_mask)]
    ell_src = np.asarray(gb.ell_src)
    ell_mask = np.asarray(gb.ell_mask)
    assert ell_mask.sum() == len(src)
    for v in range(int(gb.n_nodes)):
        expect = sorted(src[dst == v].tolist())
        got = sorted(ell_src[v][ell_mask[v]].tolist())
        assert got == expect, f"node {v}"
    assert gb.max_degree % 8 == 0


def test_ell_chain_matches_edge_list_chain():
    """Full ELL attention chain == edge-list chain (XLA reference both)."""
    gb = batch_fully_connected(3, 8, max_nodes=32, max_edges=256)
    q, k, v = _inputs(gb)
    V = gb.max_nodes
    logits_e = R.sddmm(q, k, gb.edge_src, gb.edge_dst, gb.edge_mask)
    alpha_e = R.segment_softmax(logits_e, gb.edge_dst, V, gb.edge_mask)
    out_e = R.spmm(alpha_e, v, gb.edge_src, gb.edge_dst, V, gb.edge_mask)

    logits = R.ell_sddmm(q, k, gb.ell_src, gb.ell_mask)
    alpha = R.ell_softmax(logits, gb.ell_mask)
    out = R.ell_aggregate(alpha, v, gb.ell_src, gb.ell_mask, "sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "mean", "max"])
def test_ell_aggregate_modes_finite_and_masked(kind):
    gb = batch_fully_connected(2, 1)  # zero-edge graphs: all-masked rows
    _, _, v = _inputs(gb, D=16)
    w = jnp.ones(gb.ell_mask.shape)
    out = R.ell_aggregate(w, v, gb.ell_src, gb.ell_mask, kind)
    assert np.isfinite(np.asarray(out)).all()
    assert np.all(np.asarray(out) == 0)


def test_pallas_ell_spmm_matches_oracle():
    gb = batch_fully_connected(4, 8)
    q, k, v = _inputs(gb, D=128)
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=gb.ell_mask.shape).astype(np.float32))
    expected = R.ell_aggregate(jnp.where(gb.ell_mask, w, 0.0), v,
                               gb.ell_src, gb.ell_mask, "sum")
    got = PE.ell_spmm(w, v, gb.ell_src, gb.ell_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_pallas_ell_sddmm_matches_oracle():
    gb = batch_fully_connected(4, 8)
    q, k, _ = _inputs(gb)
    expected = R.ell_sddmm(q, k, gb.ell_src, gb.ell_mask)
    got = PE.ell_sddmm(q, k, gb.ell_src, gb.ell_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_pallas_ell_softmax_matches_oracle():
    gb = batch_fully_connected(2, 8, max_nodes=24)
    logits = jnp.asarray(np.random.default_rng(2).normal(
        size=gb.ell_mask.shape).astype(np.float32) * 30)
    expected = R.ell_softmax(logits, gb.ell_mask)
    got = PE.ell_softmax(logits, gb.ell_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_pallas_ell_gradients_match_oracle():
    gb = batch_fully_connected(2, 8)
    q, k, v = _inputs(gb, D=32)

    def loss_ref(q, k, v):
        logits = R.ell_sddmm(q, k, gb.ell_src, gb.ell_mask)
        alpha = R.ell_softmax(logits, gb.ell_mask)
        return jnp.sum(R.ell_aggregate(alpha, v, gb.ell_src, gb.ell_mask,
                                       "sum") ** 2)

    def loss_pal(q, k, v):
        logits = PE.ell_sddmm(q, k, gb.ell_src, gb.ell_mask)
        alpha = R.ell_softmax(logits, gb.ell_mask)  # differentiable softmax
        return jnp.sum(PE.ell_spmm(alpha, v, gb.ell_src, gb.ell_mask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_ell_max_matches_oracle():
    from mrp_gnn_tpu.graph import batch_homogeneous, radius_edges
    from mrp_gnn_tpu.ops import pallas_ell as PE
    from mrp_gnn_tpu.ops import reference as R
    gb = batch_homogeneous(2, 16, radius_edges(16, 3), max_nodes=64)
    V = gb.max_nodes
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(size=(V, 24)).astype(np.float32))
    got = PE.ell_max(v, gb.ell_src, gb.ell_mask)
    want = R.ell_aggregate(None, v, gb.ell_src, gb.ell_mask, "max")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # padded rows (no valid in-edges) emit exactly zero
    np.testing.assert_array_equal(np.asarray(got[32:]), 0.0)
    # gradients: subgradient routes to the argmax slots
    g_k = jax.grad(lambda v: jnp.sum(
        PE.ell_max(v, gb.ell_src, gb.ell_mask) ** 2))(v)
    g_r = jax.grad(lambda v: jnp.sum(
        R.ell_aggregate(None, v, gb.ell_src, gb.ell_mask, "max") ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-5, atol=1e-5)
