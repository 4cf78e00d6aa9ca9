"""Native C++ graph-plan builder (native/graphbuild.cc) vs the numpy path:
plans must be bit-identical, and capacity-padded (inert) tile-pair plans must
leave kernel outputs unchanged."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.data import graph_native
from mrp_gnn_tpu.graph import (batch_from_positions, build_graph_batch,
                               positions_radius_edges)
from mrp_gnn_tpu.ops import pallas_bsp as B
from mrp_gnn_tpu.ops import reference as R

needs_native = pytest.mark.skipif(not graph_native.is_available(),
                                  reason="native toolchain unavailable")


def _positions(S=6, N=32, seed=0):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, N - 1, N)
    return [base + rng.uniform(-1.5, 1.5, N) for _ in range(S)]


def _numpy_batch(pos, radius, **caps):
    edges = [positions_radius_edges(p, radius) for p in pos]
    return build_graph_batch(edges, [len(p) for p in pos], **caps)


def test_positions_radius_edges_matches_index_radius():
    # integer positions at unit spacing reproduce the index-distance graph
    from mrp_gnn_tpu.graph import radius_edges
    p = np.arange(8, dtype=np.float64)
    got = positions_radius_edges(p, 2.0)
    want = radius_edges(8, 2)
    np.testing.assert_array_equal(got, want)


@needs_native
@pytest.mark.parametrize("max_pairs", [None, 64])
def test_native_plan_bit_identical(max_pairs):
    pos = _positions()
    caps = dict(max_nodes=256, max_edges=4096, max_degree=31,
                max_bsp_pairs=max_pairs)
    nat = graph_native.batch_from_positions_native(pos, 3.0, **caps)
    assert nat is not None
    ref = _numpy_batch(pos, 3.0, **caps)
    for f in ("edge_src", "edge_dst", "edge_mask", "node_mask", "node_scene",
              "n_nodes", "n_edges", "ell_src", "ell_mask", "bsp_pair_dst",
              "bsp_pair_src", "bsp_pair_first", "bsp_pair_last"):
        a, b = np.asarray(getattr(nat, f)), np.asarray(getattr(ref, f))
        np.testing.assert_array_equal(a, b, err_msg=f)
    assert nat.bsp_tile == ref.bsp_tile


@needs_native
def test_native_capacity_errors():
    pos = _positions(S=2, N=16)
    with pytest.raises(ValueError, match="edge capacity"):
        graph_native.batch_from_positions_native(
            pos, 100.0, max_nodes=32, max_edges=8, max_degree=15,
            max_bsp_pairs=None)
    with pytest.raises(ValueError, match="in-degree"):
        graph_native.batch_from_positions_native(
            pos, 100.0, max_nodes=32, max_edges=512, max_degree=4,
            max_bsp_pairs=None)


@pytest.mark.slow
def test_padded_pair_plan_is_inert():
    """Extra inert pairs (static max_bsp_pairs capacity) never change kernel
    outputs — fused one-pass, two-pass, and mean aggregation."""
    pos = _positions(S=4, N=32, seed=3)
    caps = dict(radius=3.0, max_nodes=128, max_edges=2048, max_degree=31)
    tight = batch_from_positions(pos, backend="numpy", **caps)
    padded = batch_from_positions(pos, backend="numpy", max_bsp_pairs=48,
                                  **caps)
    assert padded.bsp_pair_dst.shape[0] == 48
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(128, 24)).astype(np.float32))
    for fn in (B.bsp_attention_fused, B.bsp_attention):
        np.testing.assert_allclose(np.asarray(fn(q, k, v, padded)),
                                   np.asarray(fn(q, k, v, tight)),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(B.bsp_mean(v, padded)),
                               np.asarray(B.bsp_mean(v, tight)),
                               rtol=1e-6, atol=1e-6)


def test_dynamic_batches_share_shapes():
    """Different topologies under the same capacities => identical shapes
    (one jit compile serves the whole dynamic stream)."""
    caps = dict(radius=2.5, max_nodes=128, max_edges=2048, max_degree=31,
                max_bsp_pairs=32)
    shapes = []
    for seed in range(3):
        gb = batch_from_positions(_positions(S=4, N=32, seed=seed), **caps)
        shapes.append({f: np.asarray(getattr(gb, f)).shape
                       for f in ("edge_src", "ell_src", "bsp_pair_dst")})
        # topology genuinely varies
    assert shapes[0] == shapes[1] == shapes[2]
    e0 = np.asarray(batch_from_positions(_positions(S=4, N=32, seed=0),
                                         **caps).n_edges)
    e1 = np.asarray(batch_from_positions(_positions(S=4, N=32, seed=1),
                                         **caps).n_edges)
    assert int(e0) != int(e1)


def test_dynamic_batch_attention_matches_oracle():
    gb = batch_from_positions(_positions(S=4, N=32, seed=5), radius=3.0,
                              max_nodes=128, max_edges=2048, max_degree=31,
                              max_bsp_pairs=48)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(128, 24)).astype(np.float32))
    got = B.bsp_attention_fused(q, k, v, gb)
    logits = R.ell_sddmm(q, k, gb.ell_src, gb.ell_mask) / np.sqrt(16)
    alpha = R.ell_softmax(logits, gb.ell_mask)
    want = R.ell_aggregate(alpha, v, gb.ell_src, gb.ell_mask, "sum")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_native_partition_plan_bit_identical():
    """The C++ per-batch partition-plan builder (mrp_build_partition_plan)
    must produce arrays bit-identical to the numpy _plan_arrays path,
    including the stacked t-plans, under shared capacities."""
    if not graph_native.is_available():
        pytest.skip("no native toolchain")
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.parallel import partition as PT

    S, N, P, R = 4, 32, 4, 2
    V = S * N
    full_rep = batch_fully_connected(S // R, N, max_nodes=V // R)
    caps = PT.capacities_of(PT.partition_graph(full_rep, P))
    gb = batch_from_positions(_positions(S=S, N=N, seed=3), radius=3.0,
                              max_nodes=V, max_edges=S * N * (N - 1),
                              max_degree=N - 1,
                              max_bsp_pairs=int(
                                  batch_fully_connected(
                                      S, N,
                                      max_nodes=V).bsp_pair_dst.shape[0]))
    plan_nat = PT.partition_batch(gb, num_replicas=R, num_shards=P,
                                  capacities=caps)
    orig = graph_native.partition_plan_arrays_native
    graph_native.partition_plan_arrays_native = lambda *a, **k: None
    try:
        plan_np = PT.partition_batch(gb, num_replicas=R, num_shards=P,
                                     capacities=caps)
    finally:
        graph_native.partition_plan_arrays_native = orig
    for f in dataclasses.fields(plan_nat):
        a, b = getattr(plan_nat, f.name), getattr(plan_np, f.name)
        if isinstance(a, (int, tuple)) or a is None:
            assert a == b, f.name
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b)), f.name


def test_native_partition_plan_capacity_errors():
    if not graph_native.is_available():
        pytest.skip("no native toolchain")
    from mrp_gnn_tpu.graph import batch_fully_connected, radius_edges, \
        batch_homogeneous
    from mrp_gnn_tpu.parallel import partition as PT
    # capacities from a SPARSER graph than the batch -> must raise
    sparse = batch_homogeneous(2, 16, radius_edges(16, 1))
    caps = PT.capacities_of(PT.partition_graph(sparse, 4))
    dense = batch_fully_connected(2, 16)
    with pytest.raises(ValueError):
        PT.partition_batch(dense, num_replicas=2, num_shards=4,
                           capacities=caps)


def test_native_plan_2d_positions_bit_identical():
    """n-D metric positions (round 3): the native builder handles [N, d]
    coordinates and matches the numpy path bit-for-bit."""
    if not graph_native.is_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    S, N = 4, 32
    pos = [np.stack([np.linspace(0, N - 1, N) + rng.uniform(-1.5, 1.5, N),
                     rng.uniform(-2.0, 2.0, N)], axis=1)
           for _ in range(S)]
    caps = dict(radius=3.0, max_nodes=128, max_edges=2048, max_degree=31,
                max_bsp_pairs=48)
    gb_nat = graph_native.batch_from_positions_native(pos, **caps)
    assert gb_nat is not None
    gb_np = _numpy_batch(pos, **caps)
    for f in dataclasses.fields(gb_nat):
        a, b = getattr(gb_nat, f.name), getattr(gb_np, f.name)
        if a is None or isinstance(a, int):
            assert a == b, f.name
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b)), f.name
    assert int(np.asarray(gb_nat.n_edges)) > 0
