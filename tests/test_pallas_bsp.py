"""Tile-block-sparse fused attention kernels (ops/pallas_bsp.py) vs the XLA
ELL oracles — interpret mode on CPU (SURVEY.md section 4.2); the real-chip
run is covered by scripts + BASELINE.md numbers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.graph import (batch_fully_connected, batch_homogeneous,
                               radius_edges)
from mrp_gnn_tpu.ops import pallas_bsp as B
from mrp_gnn_tpu.ops import reference as R


def _ell_oracle(q, k, v, gb):
    logits = R.ell_sddmm(q, k, gb.ell_src, gb.ell_mask) / np.sqrt(q.shape[-1])
    alpha = R.ell_softmax(logits, gb.ell_mask)
    return R.ell_aggregate(alpha, v, gb.ell_src, gb.ell_mask, "sum")


def _rand(gb, D=24, dk=16, seed=0):
    V = gb.max_nodes
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)))


GRAPHS = {
    "fc_2x8": lambda: batch_fully_connected(2, 8),
    "radius_4x32": lambda: batch_homogeneous(4, 32, radius_edges(32, 4)),
    "fc_16x8": lambda: batch_fully_connected(16, 8),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_bsp_attention_matches_oracle(name):
    gb = GRAPHS[name]()
    assert B.supports(gb), "batch should carry a BSP plan"
    q, k, v = _rand(gb)
    got = B.bsp_attention(q, k, v, gb)
    want = _ell_oracle(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bsp_gradients_match_oracle():
    gb = batch_homogeneous(4, 32, radius_edges(32, 4))
    q, k, v = _rand(gb)

    g_bsp = jax.grad(lambda q, k, v: jnp.sum(B.bsp_attention(q, k, v, gb) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_bsp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_bsp_fused_one_pass_matches_oracle(name):
    gb = GRAPHS[name]()
    q, k, v = _rand(gb)
    got = B.bsp_attention_fused(q, k, v, gb)
    want = _ell_oracle(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bsp_fused_one_pass_gradients():
    gb = batch_homogeneous(4, 32, radius_edges(32, 4))
    q, k, v = _rand(gb)
    g_fused = jax.grad(
        lambda q, k, v: jnp.sum(B.bsp_attention_fused(q, k, v, gb) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bsp_fused_one_pass_padding_and_empty_rows():
    """Padded node slots and zero-in-degree rows emit exactly zero."""
    gb = batch_fully_connected(2, 8, max_nodes=32)
    q, k, v = _rand(gb)
    out = B.bsp_attention_fused(q, k, v, gb)
    np.testing.assert_array_equal(np.asarray(out[16:]), 0.0)
    small = batch_fully_connected(2, 8)
    out_small = B.bsp_attention_fused(q[:16], k[:16], v[:16], small)
    np.testing.assert_allclose(np.asarray(out[:16]), np.asarray(out_small),
                               rtol=1e-5, atol=1e-5)


def test_bsp_fused_bf16_values():
    gb = batch_fully_connected(2, 8)
    q, k, v = _rand(gb, D=256)
    vb = v.astype(jnp.bfloat16)
    got = B.bsp_attention_fused(q, k, vb, gb).astype(jnp.float32)
    want = _ell_oracle(q, k, vb.astype(jnp.float32), gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_bsp_mean_matches_oracle():
    gb = batch_fully_connected(2, 8)
    _, _, v = _rand(gb)
    got = B.bsp_mean(v, gb)
    ones = gb.ell_mask.astype(v.dtype)
    want = R.ell_aggregate(ones, v, gb.ell_src, gb.ell_mask, "mean")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bsp_padding_invariance():
    """Extra padded node slots (mask False) never change valid outputs."""
    gb_small = batch_fully_connected(2, 8)           # V = 16
    gb_padded = batch_fully_connected(2, 8, max_nodes=32)
    q, k, v = _rand(gb_padded)
    Vs = gb_small.max_nodes
    out_pad = B.bsp_attention(q, k, v, gb_padded)
    out_small = B.bsp_attention(q[:Vs], k[:Vs], v[:Vs], gb_small)
    np.testing.assert_allclose(np.asarray(out_pad[:Vs]),
                               np.asarray(out_small), rtol=1e-5, atol=1e-5)
    # padded destination rows aggregate to exactly zero
    np.testing.assert_array_equal(np.asarray(out_pad[Vs:]), 0.0)


def test_bsp_pair_plan_structure():
    gb = batch_homogeneous(4, 32, radius_edges(32, 4))
    pd = np.asarray(gb.bsp_pair_dst)
    ps = np.asarray(gb.bsp_pair_src)
    fi = np.asarray(gb.bsp_pair_first)
    la = np.asarray(gb.bsp_pair_last)
    nt = gb.max_nodes // gb.bsp_tile
    # dst-major grouping, one first and one last per dst tile
    assert (np.diff(pd) >= 0).all()
    for t in range(nt):
        sel = pd == t
        assert sel.any()
        assert fi[sel][0] == 1 and fi[sel][1:].sum() == 0
        assert la[sel][-1] == 1 and la[sel][:-1].sum() == 0
    # every touched (dst,src) tile pair of the ELL lists is covered
    src = np.asarray(gb.ell_src)
    mask = np.asarray(gb.ell_mask)
    T = gb.bsp_tile
    for t in range(nt):
        rows = slice(t * T, (t + 1) * T)
        need = set((src[rows][mask[rows]] // T).tolist())
        have = set(ps[pd == t].tolist())
        assert need <= have, (t, need, have)


def test_bsp_through_fusion_layer_pallas_backend():
    """The pallas backend routes ELL attention through the BSP kernels when
    the batch carries a plan; the full fusion layer must agree with xla."""
    from mrp_gnn_tpu.models.fusion import GraphFusionLayer
    gb = batch_fully_connected(2, 8)
    gb = dataclasses.replace(gb, scene_adj=None, scene_stride=0)  # force ELL
    V = gb.max_nodes
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(V, 4, 4, 16)).astype(np.float32))
    outs = {}
    for impl in ("xla", "pallas"):
        layer = GraphFusionLayer(aggregation="attention", attention_dim=8,
                                 ops_impl=impl)
        params = layer.init(jax.random.PRNGKey(0), feats, gb)
        outs[impl] = layer.apply(params, feats, gb)
    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["xla"]), rtol=1e-4, atol=1e-4)


def test_bsp_pairs_t_structure():
    """Src-major transposed plan (graph.derive_bsp_pairs_t): same real pair
    set as the dst-major plan, grouped by source tile with exactly one
    first/last per group, diagonal fallback for source-less tiles, and
    last-tile inert padding."""
    from mrp_gnn_tpu.graph import bsp_pairs_t_capacity, derive_bsp_pairs_t
    gb = batch_homogeneous(4, 32, radius_edges(32, 4))
    nt = gb.max_nodes // gb.bsp_tile
    pd_t = np.asarray(gb.bsp_pair_dst_t)
    ps_t = np.asarray(gb.bsp_pair_src_t)
    fi_t = np.asarray(gb.bsp_pair_first_t)
    la_t = np.asarray(gb.bsp_pair_last_t)
    nz = np.nonzero(la_t)[0]
    real = int(nz[-1]) + 1
    # every src tile appears exactly once as first and once as last
    for s in range(nt):
        sel = ps_t[:real] == s
        assert sel.any()
        assert fi_t[:real][sel][0] == 1 and fi_t[:real][sel][1:].sum() == 0
        assert la_t[:real][sel][-1] == 1 and la_t[:real][sel][:-1].sum() == 0
    # src-major grouping is ascending
    assert (np.diff(ps_t[:real]) >= 0).all()
    # the real (dst, src) pair multiset matches the dst-major plan's
    pd = np.asarray(gb.bsp_pair_dst)
    ps = np.asarray(gb.bsp_pair_src)
    la = np.asarray(gb.bsp_pair_last)
    real_d = int(np.nonzero(la)[0][-1]) + 1
    want = set(zip(pd[:real_d].tolist(), ps[:real_d].tolist()))
    got = set(zip(pd_t[:real].tolist(), ps_t[:real].tolist()))
    assert want <= got  # got may add diagonal fallbacks
    assert all(d == s for (d, s) in got - want)  # extras are diagonals
    # inert tail protocol (padding to a pinned capacity)
    cap = bsp_pairs_t_capacity(int(pd.shape[0]), nt)
    padded = derive_bsp_pairs_t(pd, ps, la, nt, max_pairs=cap)
    assert padded[0].shape[0] == cap
    nz = np.nonzero(padded[3])[0]
    end = int(nz[-1])
    assert (padded[0][end + 1:] == nt - 1).all()
    assert (padded[1][end + 1:] == nt - 1).all()
    assert (padded[2][end + 1:] == 0).all()
    assert (padded[3][end + 1:] == 0).all()


def test_bsp_backward_kernels_match_math():
    """The standalone backward kernels (block-sparse SDDMM and transposed
    SpMM) agree with the dense gather math, including under inert-padded
    plans."""
    gb = batch_homogeneous(4, 32, radius_edges(32, 4))
    V = gb.max_nodes
    deg = gb.ell_src.shape[1]
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(V, 24)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V, 24)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, deg)).astype(np.float32))
    w = w * gb.ell_mask  # contract: zero on masked slots
    # SDDMM: out[v, j] = <a[v], b[src[v, j]]> on valid slots
    got = B._sddmm_forward(a, b, gb.ell_src, gb.bsp_pair_dst,
                           gb.bsp_pair_src, gb.bsp_pair_first,
                           gb.bsp_pair_last, gb.bsp_tile, True)
    want = jnp.einsum("vd,vjd->vj", a, b[gb.ell_src])
    m = np.asarray(gb.ell_mask)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               rtol=1e-5, atol=1e-5)
    # transposed SpMM: out[s] = sum_{v,j: src=s} w[v,j] * a[v]
    got_t = B._spmm_t_forward(w, a, gb.ell_src, gb.bsp_pair_dst_t,
                              gb.bsp_pair_src_t, gb.bsp_pair_first_t,
                              gb.bsp_pair_last_t, gb.bsp_tile, True)
    want_t = jnp.zeros_like(a).at[gb.ell_src].add(
        (w * gb.ell_mask)[..., None] * a[:, None, :])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)


def test_bsp_gradients_bf16_values():
    gb = batch_fully_connected(2, 8)
    q, k, v = _rand(gb, D=256)
    vb = v.astype(jnp.bfloat16)
    g_bsp = jax.grad(
        lambda q, k, v: jnp.sum(B.bsp_attention_fused(q, k, v, gb)
                                .astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(q, k, vb)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_ell_oracle(q, k, v.astype(jnp.float32), gb)
                                ** 2),
        argnums=(0, 1, 2))(q, k, vb)
    for a, b in zip(g_bsp, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_bsp_backward_wide_features():
    """The backward SDDMM chunks wide feature dims (VMEM guard) — grads at
    D=8192+ must still be exact."""
    gb = batch_fully_connected(2, 8, max_nodes=16)
    V = gb.max_nodes
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(V, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, 8448)).astype(np.float32))  # > 4096
    g_bsp = jax.grad(lambda v: jnp.sum(B.bsp_attention_fused(q, k, v, gb)
                                       ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_bsp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_bsp_multi_head_vmap():
    """attention_heads > 1 vmaps the whole edge block over the head axis —
    the BSP kernels must batch correctly under vmap (fwd and bwd)."""
    from mrp_gnn_tpu.models.fusion import GraphFusionLayer
    gb = dataclasses.replace(batch_fully_connected(2, 8),
                             scene_adj=None, scene_stride=0)
    V = gb.max_nodes
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(V, 4, 4, 16)).astype(np.float32))
    outs = {}
    for impl in ("xla", "pallas"):
        layer = GraphFusionLayer(aggregation="attention", attention_dim=8,
                                 attention_heads=4, ops_impl=impl)
        params = layer.init(jax.random.PRNGKey(0), feats, gb)
        outs[impl] = layer.apply(params, feats, gb)
        g = jax.grad(lambda f: jnp.sum(layer.apply(params, f, gb) ** 2))(
            feats)
        assert bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["xla"]), rtol=1e-4, atol=1e-4)


# --- high-degree row-expansion (docs/kernels.md "Degree cap") ----------------


def _hd_graph(n_robots, max_nodes):
    from mrp_gnn_tpu.graph import fully_connected_edges
    return batch_homogeneous(1, n_robots, fully_connected_edges(n_robots),
                             max_nodes=max_nodes)


@pytest.mark.parametrize("n,V", [(193, 256), (257, 384)])  # deg 192 / 256
def test_expanded_plan_built_past_cap(n, V):
    gb = _hd_graph(n, V)
    assert not B.supports(gb)          # past the 128-column unroll cap
    assert B.supports_expanded(gb)
    xp = gb.bsp_expanded
    assert xp.rows * xp.width >= gb.ell_src.shape[1]
    assert xp.width <= 128
    # expanded dst tiles divide evenly; src tiles stay in the original space
    assert (gb.max_nodes * xp.rows) % gb.bsp_tile == 0
    assert int(np.asarray(xp.pair_src).max()) < gb.max_nodes // gb.bsp_tile


@pytest.mark.parametrize("n,V", [(193, 256), (257, 384)])
def test_expanded_attention_matches_oracle(n, V):
    gb = _hd_graph(n, V)
    q, k, v = _rand(gb)
    got = B.expanded_attention(q, k, v, gb)
    want = _ell_oracle(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_expanded_attention_gradients():
    gb = _hd_graph(193, 256)
    q, k, v = _rand(gb)
    g_x = jax.grad(
        lambda q, k, v: jnp.sum(B.expanded_attention(q, k, v, gb) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_x, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_expanded_mean_matches_oracle_and_grads():
    gb = _hd_graph(193, 256)
    _, _, v = _rand(gb)
    got = B.expanded_mean(v, gb)
    want = R.ell_aggregate(gb.ell_mask.astype(v.dtype), v, gb.ell_src,
                           gb.ell_mask, "mean")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g_x = jax.grad(lambda v: jnp.sum(B.expanded_mean(v, gb) ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum(R.ell_aggregate(
        gb.ell_mask.astype(v.dtype), v, gb.ell_src, gb.ell_mask,
        "mean") ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_expanded_dispatch_routes_high_degree():
    from mrp_gnn_tpu.ops import dispatch
    gb = _hd_graph(193, 256)
    ops = dispatch.get_ops("pallas")
    q, k, v = _rand(gb)
    got = ops.ell_attention(q, k, v, gb)
    want = _ell_oracle(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    got_m = ops.ell_mean(v, gb)
    want_m = R.ell_aggregate(gb.ell_mask.astype(v.dtype), v, gb.ell_src,
                             gb.ell_mask, "mean")
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_expanded_padding_invariance():
    """Adding empty padding nodes never changes valid rows."""
    gb_a = _hd_graph(193, 256)
    gb_b = _hd_graph(193, 384)  # extra all-padding tile rows
    q, k, v = _rand(gb_a)
    qb = jnp.pad(q, ((0, 128), (0, 0)))
    kb = jnp.pad(k, ((0, 128), (0, 0)))
    vb = jnp.pad(v, ((0, 128), (0, 0)))
    a = B.expanded_attention(q, k, v, gb_a)
    b = B.expanded_attention(qb, kb, vb, gb_b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:256],
                               rtol=1e-5, atol=1e-5)


def test_bsp_rolled_column_loop_matches_oracle():
    """ELL widths past the unroll threshold (64) take the lax.fori_loop
    column build (_col_loop) — same math as the unrolled form, constant
    Mosaic stack. Square-plan case at deg 80, values + grads."""
    gb = batch_homogeneous(2, 96, radius_edges(96, 40))
    assert gb.ell_src.shape[1] > 64  # fori path
    assert B.supports(gb)
    q, k, v = _rand(gb)
    got = B.bsp_attention_fused(q, k, v, gb)
    want = _ell_oracle(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    g_got = jax.grad(
        lambda q, k, v: jnp.sum(B.bsp_attention_fused(q, k, v, gb) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_expanded_through_fusion_layer_pallas_backend():
    """The pallas backend routes >128-degree ELL attention through the
    row-expanded kernels; the full fusion layer (projection convs, update,
    multi-head loop) must agree with xla, single- and multi-head."""
    from mrp_gnn_tpu.models.fusion import GraphFusionLayer
    gb = _hd_graph(193, 256)
    gb = dataclasses.replace(gb, scene_adj=None, scene_stride=0)  # force ELL
    assert B.supports_expanded(gb)
    V = gb.max_nodes
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(V, 2, 2, 16)).astype(np.float32))
    for heads in (1, 2):
        outs = {}
        for impl in ("xla", "pallas"):
            layer = GraphFusionLayer(aggregation="attention", attention_dim=8,
                                     attention_heads=heads, ops_impl=impl)
            params = layer.init(jax.random.PRNGKey(0), feats, gb)
            outs[impl] = layer.apply(params, feats, gb)
        np.testing.assert_allclose(np.asarray(outs["pallas"]),
                                   np.asarray(outs["xla"]),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"heads={heads}")


def test_expanded_dynamic_optin_capacity():
    """batch_from_positions(..., max_expanded_pairs=N): explicit opt-in
    pinned expanded plans for dynamic high-degree streams — identical
    shapes across topologies (one jit compile), values match the oracle
    per topology, both builder backends bit-agree, and violations raise.
    (The auto pipeline keeps the XLA fallback: expanded-plan length is not
    subset-monotone — docs/kernels.md.)"""
    from mrp_gnn_tpu.data import graph_native
    from mrp_gnn_tpu.graph import batch_from_positions
    rng = np.random.default_rng(0)
    N, V = 140, 256  # deg capacity 139 > 128
    caps = dict(max_nodes=V, max_edges=N * (N - 1), max_degree=N - 1,
                max_expanded_pairs=64)
    gbs = []
    for seed in (0, 1):
        pos = np.sort(rng.uniform(0, 30.0, size=N))
        gb_np = batch_from_positions([pos], 12.0, backend="numpy", **caps)
        assert B.supports_expanded(gb_np) and not B.supports(gb_np)
        assert int(gb_np.bsp_expanded.pair_dst.shape[0]) == 64
        if graph_native.is_available():
            gb_nat = batch_from_positions([pos], 12.0, backend="native",
                                          **caps)
            for a, b in zip(jax.tree_util.tree_leaves(gb_np.bsp_expanded),
                            jax.tree_util.tree_leaves(gb_nat.bsp_expanded)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        gbs.append(gb_np)
    # identical pytree shapes across topologies -> one compile serves both
    for a, b in zip(jax.tree_util.tree_leaves(gbs[0]),
                    jax.tree_util.tree_leaves(gbs[1])):
        assert np.asarray(a).shape == np.asarray(b).shape
    for gb in gbs:
        q, k, v = _rand(gb)
        got = B.expanded_attention(q, k, v, gb)
        want = _ell_oracle(q, k, v, gb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
    # capacity violation raises at plan build
    pos = np.sort(rng.uniform(0, 30.0, size=N))
    with pytest.raises(ValueError, match="pairs exceed"):
        batch_from_positions([pos], 12.0, backend="numpy",
                             **{**caps, "max_expanded_pairs": 2})


def test_dual_transposed_spmm_matches_separate_sweeps():
    """_spmm_t2 (bench-only — chip A/B measured it 0.955x of the separate
    sweeps, BASELINE.md round 5) must stay bit-consistent with two
    _spmm_t_forward calls over the same plan."""
    gb = batch_homogeneous(2, 16, radius_edges(16, 5), max_nodes=64)
    assert B.supports(gb)
    V, deg = gb.ell_src.shape
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.uniform(size=(V, deg)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(V, deg)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(V, 32)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    plan_t = (gb.bsp_pair_dst_t, gb.bsp_pair_src_t, gb.bsp_pair_first_t,
              gb.bsp_pair_last_t)
    o1, o2 = B._spmm_t2_forward(w1, x1, w2, x2, gb.ell_src, *plan_t,
                                gb.bsp_tile, True, out_rows=V,
                                out1_dtype=x1.dtype, out2_dtype=x2.dtype)
    r1 = B._spmm_t_forward(w1, x1, gb.ell_src, *plan_t, gb.bsp_tile, True,
                           out_dtype=x1.dtype, out_rows=V)
    r2 = B._spmm_t_forward(w2, x2, gb.ell_src, *plan_t, gb.bsp_tile, True,
                           out_dtype=x2.dtype, out_rows=V)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(r1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(r2),
                               rtol=1e-6, atol=1e-6)


def test_hideg_fallback_warns_without_optin():
    """A capacity-pinned stream crossing the 128-degree cap WITHOUT
    max_expanded_pairs warns about the gather-league throughput cliff;
    setting the capacity (or staying static/unpinned) stays silent."""
    import warnings as _w
    from mrp_gnn_tpu.data import graph_native
    from mrp_gnn_tpu.graph import batch_from_positions
    rng = np.random.default_rng(0)
    N, V = 140, 256
    caps = dict(max_nodes=V, max_edges=N * (N - 1), max_degree=N - 1)
    pos = np.sort(rng.uniform(0, 30.0, size=N))
    backends = ["numpy"] + (["native"] if graph_native.is_available() else [])
    for backend in backends:
        with pytest.warns(UserWarning, match="max_expanded_pairs"):
            gb = batch_from_positions([pos], 12.0, backend=backend, **caps)
        assert gb.bsp_expanded is None
        # the opt-in silences it (pytest -W error::UserWarning clean)
        with _w.catch_warnings():
            _w.simplefilter("error", UserWarning)
            gb = batch_from_positions([pos], 12.0, backend=backend,
                                      max_expanded_pairs=64, **caps)
        assert gb.bsp_expanded is not None
    # static unpinned batches auto-build the plan: no warning either
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        gb = _hd_graph(193, 256)
    assert gb.bsp_expanded is not None


@pytest.mark.parametrize("n,V", [(193, 256), (257, 384)])
def test_expanded_fused_one_pass_matches_oracle(n, V):
    """One-pass expanded attention (raw (acc, m, l) kernel + XLA cross-row
    combine) matches the oracle and the two-kernel form."""
    gb = _hd_graph(n, V)
    q, k, v = _rand(gb)
    got = B.expanded_attention_fused(q, k, v, gb)
    want = _ell_oracle(q, k, v, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_expanded_fused_one_pass_gradients():
    gb = _hd_graph(193, 256)
    q, k, v = _rand(gb)
    g_x = jax.grad(
        lambda q, k, v: jnp.sum(B.expanded_attention_fused(q, k, v, gb) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_x, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_expanded_fused_padding_and_empty_rows():
    """Nodes with zero in-edges (and padded slots) emit exactly zero
    through the cross-row combine."""
    gb_a = _hd_graph(193, 256)
    gb_b = _hd_graph(193, 384)  # extra all-padding tile rows
    q, k, v = _rand(gb_a)
    out = B.expanded_attention_fused(q, k, v, gb_a)
    outb = B.expanded_attention_fused(jnp.pad(q, ((0, 128), (0, 0))),
                                      jnp.pad(k, ((0, 128), (0, 0))),
                                      jnp.pad(v, ((0, 128), (0, 0))), gb_b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(outb)[:256],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(outb)[193:], 0.0)


def test_expanded_heterogeneous_scenes():
    """Mixed team sizes where only SOME scenes exceed the cap: the batch
    still builds one expanded plan over the shared ELL width, and values,
    grads, and dispatch agree with the oracle (one-pass path)."""
    from mrp_gnn_tpu.graph import build_graph_batch, fully_connected_edges
    sizes = [193, 50, 100]
    gb = build_graph_batch(
        [fully_connected_edges(n) for n in sizes], sizes,
        max_nodes=384, max_edges=sum(n * (n - 1) for n in sizes))
    assert gb.ell_src.shape[1] > 128 and B.supports_expanded(gb)
    q, k, v = _rand(gb)
    for fn in (B.expanded_attention_fused, B.expanded_attention):
        got = fn(q, k, v, gb)
        want = _ell_oracle(q, k, v, gb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
    g_x = jax.grad(lambda v: jnp.sum(
        B.expanded_attention_fused(q, k, v, gb) ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum(_ell_oracle(q, k, v, gb) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)
