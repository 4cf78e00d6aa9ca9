"""Distributed-without-a-cluster tests (SURVEY.md section 4.2): the
partitioned fusion path must be allclose to the unpartitioned single-device
run, on 8 virtual CPU devices (conftest sets the XLA flag)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.graph import batch_fully_connected, batch_homogeneous, radius_edges
from mrp_gnn_tpu.models.fusion import default_edge_fusion
from mrp_gnn_tpu.ops import dispatch
from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
from mrp_gnn_tpu.parallel.mesh import make_mesh
from mrp_gnn_tpu.parallel.partition import (boundary_fraction, exchange_rows,
                                            partition_graph)

OPS = dispatch.get_ops("xla")


def test_mesh_needs_enough_devices():
    with pytest.raises(ValueError):
        make_mesh(4, 4)  # only 8 cpu devices


def test_partition_plan_structure():
    # 2 scenes x 8 robots = 16 nodes over 4 shards -> scenes straddle shards
    gb = batch_fully_connected(2, 8)
    plan = partition_graph(gb, 4)
    assert plan.nodes_per_shard == 4
    src = np.asarray(plan.src_global)
    dst = np.asarray(plan.dst_local)
    m = np.asarray(plan.mask)
    lm = np.asarray(plan.local_mask)
    # every valid edge's dst is local to its shard
    assert (dst[m] >= 0).all() and (dst[m] < 4).all()
    # total edges preserved
    assert m.sum() == int(gb.n_edges)
    # local_mask consistent with ownership
    for p in range(4):
        sel = m[p]
        assert (lm[p][sel] == ((src[p][sel] // 4) == p)).all()
    # fully-connected 8-robot scenes over 4-node shards: most edges boundary
    assert boundary_fraction(plan) > 0.5


def test_partition_plan_ell_and_remote_layouts():
    """Round-2 layouts: local edges land in the per-shard ELL neighbour list
    (+ BSP tile-pair plan), boundary edges in the COMPACT remote edge list —
    together they must account for exactly the original edge set."""
    gb = batch_homogeneous(2, 16, radius_edges(16, 3))
    plan = partition_graph(gb, 4)
    nps = plan.nodes_per_shard
    src = np.asarray(plan.src_global)
    m = np.asarray(plan.mask)
    lm = np.asarray(plan.local_mask)
    ell_s = np.asarray(plan.ell_src)
    ell_m = np.asarray(plan.ell_mask)
    r_m = np.asarray(plan.remote_mask)
    # local + remote slot counts == valid edge count, per shard
    for p in range(plan.num_shards):
        assert ell_m[p].sum() == (m[p] & lm[p]).sum()
        assert r_m[p].sum() == (m[p] & ~lm[p]).sum()
        # ELL entries are shard-local and reproduce the local multiset
        assert (ell_s[p][ell_m[p]] >= 0).all()
        assert (ell_s[p][ell_m[p]] < nps).all()
        want = np.sort(src[p][m[p] & lm[p]] - p * nps)
        got = np.sort(ell_s[p][ell_m[p]])
        np.testing.assert_array_equal(got, want)
        # remote slots point inside the receive buffer
        r_slot = np.asarray(plan.remote_slot)[p][r_m[p]]
        assert (r_slot >= 0).all() and (r_slot < plan.recv_rows).all()
    # a BSP tile plan exists whenever an MXU-friendly tile divides nps
    assert plan.bsp_tile > 0
    assert plan.bsp_pair_dst.shape[0] == plan.num_shards


def test_partition_requires_divisible_nodes():
    gb = batch_fully_connected(1, 5)
    with pytest.raises(ValueError):
        partition_graph(gb, 4)


def _run_both(aggregation, data_ax, graph_ax, seed=0, **fused_kw):
    """Partitioned vs unpartitioned edge fusion on the same inputs."""
    n_scenes_per_replica, robots = 2, 8
    gb_rep = batch_fully_connected(n_scenes_per_replica, robots)
    V_rep = gb_rep.max_nodes
    V_tot = V_rep * data_ax
    D, dk = 24, 8

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(V_tot, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V_tot, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V_tot, D)).astype(np.float32))

    # oracle: per data replica, unpartitioned
    outs = []
    for d in range(data_ax):
        s = slice(d * V_rep, (d + 1) * V_rep)
        outs.append(default_edge_fusion(OPS, aggregation, q[s], k[s], v[s], gb_rep))
    expected = jnp.concatenate(outs)

    mesh = make_mesh(data_ax, graph_ax)
    plan = partition_graph(gb_rep, graph_ax)
    edge_fn = make_partitioned_edge_fusion(mesh, plan, **fused_kw)
    got = jax.jit(lambda q, k, v: edge_fn(OPS, aggregation, q, k, v, gb_rep))(q, k, v)
    return np.asarray(expected), np.asarray(got)


@pytest.mark.parametrize("aggregation", ["attention", "mean"])
def test_partitioned_matches_unpartitioned_graph_only(aggregation):
    expected, got = _run_both(aggregation, data_ax=1, graph_ax=8)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_partitioned_matches_unpartitioned_data_x_graph():
    expected, got = _run_both("attention", data_ax=2, graph_ax=4)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("exchange,overlap", [("boundary", False),
                                              ("all_gather", True)])
def test_exchange_mode_ab_matches(exchange, overlap):
    """Both A/B controls (legacy all_gather; serialized exchange) stay exact."""
    expected, got = _run_both("attention", data_ax=1, graph_ax=8,
                              exchange=exchange, overlap=overlap)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_boundary_traffic_scales_with_boundary_fraction():
    """The contract's byte-count claim (BASELINE.json:5): for a radius-
    connectivity swarm the boundary exchange moves far less than the legacy
    full all_gather, and covers every genuinely-requested row."""
    # 4 scenes x 32 robots, comm radius 4 -> sparse neighbour graphs; each
    # scene straddles two 16-node shards so real boundary edges exist.
    gb = batch_homogeneous(4, 32, radius_edges(32, 4))
    plan = partition_graph(gb, 8)
    rows = exchange_rows(plan)
    assert boundary_fraction(plan) < 0.35
    # per-shard received rows: boundary-only must undercut the full gather
    # by a large factor on sparse topologies.
    assert rows["boundary"] * 3 < rows["all_gather"], rows
    # and the padded plan covers at least all genuinely-needed rows.
    assert rows["padded_total"] >= rows["useful_total"] > 0
    # dense fully-connected small teams, by contrast, are mostly boundary:
    gb_fc = batch_fully_connected(2, 8)
    plan_fc = partition_graph(gb_fc, 8)
    assert boundary_fraction(plan_fc) > 0.8


def test_swarm_preset_has_real_boundary():
    """Guard: config 5's replica graph must STRADDLE graph shards — a
    scene-aligned layout silently degenerates to zero boundary exchange."""
    from mrp_gnn_tpu.config import get_config
    from mrp_gnn_tpu.train import replica_graph_for
    cfg = get_config("swarm_partitioned")
    gb = replica_graph_for(cfg)
    plan = partition_graph(gb, cfg.parallel.graph_axis_size)
    assert boundary_fraction(plan) > 0.02
    assert len(plan.deltas) >= 1


def test_partitioned_gradients_match():
    gb = batch_fully_connected(2, 8)
    V, D, dk = gb.max_nodes, 12, 4
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))

    mesh = make_mesh(1, 8)
    plan = partition_graph(gb, 8)
    edge_fn = make_partitioned_edge_fusion(mesh, plan)

    def loss_ref(args):
        q, k, v = args
        return jnp.sum(default_edge_fusion(OPS, "attention", q, k, v, gb) ** 2)

    def loss_part(args):
        q, k, v = args
        return jnp.sum(edge_fn(OPS, "attention", q, k, v, gb) ** 2)

    g_ref = jax.grad(loss_ref)((q, k, v))
    g_part = jax.jit(jax.grad(loss_part))((q, k, v))
    for a, b in zip(g_ref, g_part):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_per_shard_bsp_tail_pairs_are_inert():
    """Stacked per-shard BSP plans must pad with LAST-tile (nt-1) inert
    pairs, matching graph.build_bsp_pairs' protocol: on TPU an inert step
    that re-maps the Pallas output window to tile 0 after its emission
    overwrites tile 0 with stale VMEM contents at end-of-grid copy-out
    (interpret mode re-reads output blocks so CPU cannot catch it — this
    structural guard plus bench.py's on-chip check cover it)."""
    from mrp_gnn_tpu.parallel.partition import (PlanCapacities,
                                                capacities_of,
                                                partition_batch)
    # Uneven per-shard pair counts: radius swarm over 2 shards of 128 nodes
    # (bsp_tile 128 -> nt = 1 is trivial) — use 2 shards x 256 for nt = 2.
    gb_full = batch_fully_connected(32, 16, max_nodes=512)
    caps = capacities_of(partition_graph(gb_full, 2))
    assert caps.bsp_pairs > 0
    # a sparser radius topology under-fills the capacity -> tail padding
    gb = batch_homogeneous(32, 16, radius_edges(16, 2), max_nodes=512)
    plan = partition_graph(gb, 2, capacities=caps)
    nt = plan.nodes_per_shard // plan.bsp_tile
    pd = np.asarray(plan.bsp_pair_dst)
    ps = np.asarray(plan.bsp_pair_src)
    fi = np.asarray(plan.bsp_pair_first)
    la = np.asarray(plan.bsp_pair_last)
    for p in range(plan.num_shards):
        live = np.nonzero(la[p])[0]
        assert live.size, "every dst tile emits at least once"
        end = live[-1]
        assert pd[p, end] == nt - 1  # final real pair targets the last tile
        # inert tail: stays on the last tile, never fires first/last
        assert (pd[p, end + 1:] == nt - 1).all()
        assert (ps[p, end + 1:] == nt - 1).all()
        assert (fi[p, end + 1:] == 0).all()
        assert (la[p, end + 1:] == 0).all()
    # the dynamic stacked form obeys the same protocol
    plan_d = partition_batch(gb, num_replicas=2, num_shards=2,
                             capacities=capacities_of(
                                 partition_graph(gb_full, 2)))
    nt_d = plan_d.nodes_per_shard // plan_d.bsp_tile
    la_d = np.asarray(plan_d.bsp_pair_last)
    pd_d = np.asarray(plan_d.bsp_pair_dst)
    for row in range(la_d.shape[0]):
        end = np.nonzero(la_d[row])[0][-1]
        assert (pd_d[row, end + 1:] == nt_d - 1).all()


def test_partitioned_max_matches_unpartitioned():
    """Max aggregation decomposes over the local/remote split exactly."""
    expected, got = _run_both("max", data_ax=1, graph_ax=8)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_partition_plan_carries_expanded_plans_past_cap():
    """Round 5: a deg>128 STATIC partition plan carries per-shard row-
    expanded rectangular tile-pair plans (EdgePartitionPlan.xp_*), each
    bit-matching graph.build_expanded_bsp of that shard's local ELL arrays
    pinned to the common stacked length — so the partitioned local
    aggregate can ride the expanded kernels instead of the gather league."""
    from mrp_gnn_tpu.graph import build_expanded_bsp, fully_connected_edges
    gb = batch_homogeneous(2, 193, fully_connected_edges(193),
                           max_nodes=512)
    # 2 shards of 256 nodes: scene 0 sits inside shard 0, so local
    # in-degree reaches 192 (> 128 needs nodes_per_shard > 128)
    plan = partition_graph(gb, 2)
    L = int(plan.ell_mask.shape[-1])
    assert L > 128
    assert plan.xp_pair_dst is not None and plan.xp_rows >= 2
    assert plan.xp_width <= 128
    P, n_xp = plan.xp_pair_dst.shape
    assert P == 2
    for p in range(P):
        ref = build_expanded_bsp(np.asarray(plan.ell_src[p]),
                                 np.asarray(plan.ell_mask[p]),
                                 plan.bsp_tile, max_pairs=n_xp,
                                 to_device=False)
        assert ref.rows == plan.xp_rows and ref.width == plan.xp_width
        for got, want in (
                (plan.xp_pair_dst[p], ref.pair_dst),
                (plan.xp_pair_src[p], ref.pair_src),
                (plan.xp_pair_first[p], ref.pair_first),
                (plan.xp_pair_last[p], ref.pair_last),
                (plan.xp_pair_dst_t[p], ref.pair_dst_t),
                (plan.xp_pair_src_t[p], ref.pair_src_t),
                (plan.xp_pair_first_t[p], ref.pair_first_t),
                (plan.xp_pair_last_t[p], ref.pair_last_t)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_partition_capacity_expanded_optin_and_warning():
    """Capacity-pinned (dynamic) high-degree plans build expanded arrays
    only under the PlanCapacities.xp_pairs opt-in; without it they warn
    about the gather fallback once."""
    import dataclasses as dc
    import warnings as _w
    from mrp_gnn_tpu.parallel.partition import capacities_of
    from mrp_gnn_tpu.graph import fully_connected_edges
    gb = batch_homogeneous(2, 193, fully_connected_edges(193),
                           max_nodes=512)
    base = partition_graph(gb, 2)
    caps = capacities_of(base)
    with pytest.warns(UserWarning, match="xp_pairs"):
        plan = partition_graph(gb, 2, capacities=caps)
    assert plan.xp_pair_dst is None and plan.xp_rows == 0
    n_xp = int(base.xp_pair_dst.shape[-1])
    caps_xp = dc.replace(caps, xp_pairs=n_xp)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        plan = partition_graph(gb, 2, capacities=caps_xp)
    assert plan.xp_pair_dst is not None
    assert int(plan.xp_pair_dst.shape[-1]) == n_xp
    np.testing.assert_array_equal(np.asarray(plan.xp_pair_dst),
                                  np.asarray(base.xp_pair_dst))
    # violation raises at plan build (standard capacity contract)
    with pytest.raises(ValueError, match="pairs exceed"):
        partition_graph(gb, 2, capacities=dc.replace(caps, xp_pairs=2))


def test_per_shard_expanded_kernels_match_local_oracle():
    """The stacked per-shard expanded plans drive the kernels correctly:
    for every shard, xp_sddmm / xp_weighted_aggregate (interpret mode,
    outside shard_map) equal the ELL oracle on that shard's LOCAL edges —
    the exact composition parallel/fused.py runs compiled on TPU."""
    from mrp_gnn_tpu.graph import fully_connected_edges
    from mrp_gnn_tpu.ops import pallas_bsp as B
    from mrp_gnn_tpu.ops import reference as R
    gb = batch_homogeneous(2, 193, fully_connected_edges(193),
                           max_nodes=512)
    plan = partition_graph(gb, 2)
    assert plan.xp_pair_dst is not None
    nps = plan.nodes_per_shard
    rng = np.random.default_rng(0)
    for p in range(plan.num_shards):
        ell_s = jnp.asarray(plan.ell_src[p])
        ell_m = jnp.asarray(plan.ell_mask[p])
        xplan = tuple(jnp.asarray(a[p]) for a in (
            plan.xp_pair_dst, plan.xp_pair_src, plan.xp_pair_first,
            plan.xp_pair_last, plan.xp_pair_dst_t, plan.xp_pair_src_t,
            plan.xp_pair_first_t, plan.xp_pair_last_t))
        q = jnp.asarray(rng.normal(size=(nps, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(nps, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(nps, 16)).astype(np.float32))
        lg = B.xp_sddmm(q, k, ell_s, xplan, plan.xp_rows, plan.xp_width,
                        plan.bsp_tile)
        lg_ref = R.ell_sddmm(q, k, ell_s, ell_m)
        np.testing.assert_allclose(np.asarray(jnp.where(ell_m, lg, 0.0)),
                                   np.asarray(jnp.where(ell_m, lg_ref, 0.0)),
                                   rtol=1e-5, atol=1e-5)
        w = jnp.where(ell_m, jnp.asarray(
            rng.uniform(size=ell_m.shape).astype(np.float32)), 0.0)
        agg = B.xp_weighted_aggregate(w, v, ell_s, xplan, plan.xp_rows,
                                      plan.xp_width, plan.bsp_tile)
        agg_ref = R.ell_aggregate(w, v, ell_s, ell_m, "sum")
        np.testing.assert_allclose(np.asarray(agg), np.asarray(agg_ref),
                                   rtol=1e-4, atol=1e-4)


def test_partitioned_high_degree_matches_unpartitioned():
    """> 128 in-neighbours: the partitioned local path falls back to the
    XLA ELL gather (the BSP-in-shard_map cap — parallel/fused.py) and must
    stay exact, values AND grads. Round-4 regression for the high-degree
    extension era."""
    from mrp_gnn_tpu.graph import fully_connected_edges
    gb = batch_homogeneous(2, 193, fully_connected_edges(193),
                           max_nodes=512)
    assert gb.ell_src.shape[1] > 128
    V, D, dk = gb.max_nodes, 32, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    mesh = make_mesh(1, 4)
    plan = partition_graph(gb, 4)
    edge_fn = make_partitioned_edge_fusion(mesh, plan)
    got = jax.jit(lambda q, k, v: edge_fn(OPS, "attention", q, k, v,
                                          gb))(q, k, v)
    want = jax.jit(lambda q, k, v: default_edge_fusion(
        OPS, "attention", q, k, v, gb))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.jit(jax.grad(lambda v: jnp.sum(
        edge_fn(OPS, "attention", q, k, v, gb) ** 2)))(v)
    g2 = jax.jit(jax.grad(lambda v: jnp.sum(
        default_edge_fusion(OPS, "attention", q, k, v, gb) ** 2)))(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
