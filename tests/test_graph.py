import numpy as np
import pytest

from mrp_gnn_tpu.graph import (
    GraphBatch,
    batch_fully_connected,
    build_graph_batch,
    fully_connected_edges,
)


def test_fully_connected_edges_no_self_loops():
    e = fully_connected_edges(3)
    assert e.shape == (2, 6)
    assert not np.any(e[0] == e[1])
    # every ordered pair present
    pairs = set(zip(e[0].tolist(), e[1].tolist()))
    assert pairs == {(j, i) for i in range(3) for j in range(3) if i != j}


def test_fully_connected_edges_self_loops():
    e = fully_connected_edges(2, self_loops=True)
    assert e.shape == (2, 4)


def test_single_robot_graph_has_no_edges():
    e = fully_connected_edges(1)
    assert e.shape == (2, 0)


def test_batch_layout_and_sorting():
    gb = batch_fully_connected(num_scenes=3, robots_per_scene=4,
                               max_nodes=16, max_edges=40)
    assert gb.max_nodes == 16 and gb.max_edges == 40
    assert int(gb.n_nodes) == 12
    assert int(gb.n_edges) == 36
    dst = np.asarray(gb.edge_dst)[np.asarray(gb.edge_mask)]
    assert np.all(np.diff(dst) >= 0), "valid edges must be dst-sorted"
    # edges never cross scenes
    scene = np.asarray(gb.node_scene)
    src = np.asarray(gb.edge_src)[np.asarray(gb.edge_mask)]
    assert np.all(scene[src] == scene[dst])


def test_padding_slots_are_masked_zeros():
    gb = batch_fully_connected(2, 2, max_nodes=8, max_edges=10)
    em = np.asarray(gb.edge_mask)
    assert em.sum() == 4
    assert np.all(np.asarray(gb.edge_src)[~em] == 0)
    assert np.all(np.asarray(gb.edge_dst)[~em] == 0)
    nm = np.asarray(gb.node_mask)
    assert nm.sum() == 4 and not nm[4:].any()


def test_heterogeneous_scene_sizes():
    edges = [fully_connected_edges(n) for n in (2, 5, 1)]
    gb = build_graph_batch(edges, [2, 5, 1], max_nodes=10, max_edges=32)
    assert int(gb.n_nodes) == 8
    assert int(gb.n_edges) == 2 + 20 + 0
    scene = np.asarray(gb.node_scene)
    assert list(scene[:8]) == [0, 0, 1, 1, 1, 1, 1, 2]


def test_overflow_raises():
    with pytest.raises(ValueError):
        batch_fully_connected(2, 3, max_nodes=4, max_edges=100)
    with pytest.raises(ValueError):
        batch_fully_connected(2, 3, max_nodes=8, max_edges=4)


def test_graphbatch_is_pytree():
    import jax
    gb = batch_fully_connected(1, 3)
    leaves = jax.tree_util.tree_leaves(gb)
    assert len(leaves) == 10  # 7 graph arrays + scene_adj + ell_src/mask
    gb2 = jax.tree_util.tree_map(lambda x: x, gb)
    assert isinstance(gb2, GraphBatch)


def test_radius_edges():
    import numpy as np
    from mrp_gnn_tpu.graph import radius_edges
    e = radius_edges(5, 1)
    pairs = set(zip(e[0].tolist(), e[1].tolist()))
    assert pairs == {(j, i) for i in range(5) for j in range(5)
                     if i != j and abs(i - j) <= 1}
    # radius >= n-1 equals fully connected
    from mrp_gnn_tpu.graph import fully_connected_edges
    ef = fully_connected_edges(4)
    er = radius_edges(4, 3)
    assert set(zip(er[0].tolist(), er[1].tolist())) == \
        set(zip(ef[0].tolist(), ef[1].tolist()))


def test_batch_homogeneous_radius_block_metadata():
    import numpy as np
    from mrp_gnn_tpu.graph import batch_homogeneous, radius_edges
    gb = batch_homogeneous(2, 8, radius_edges(8, 2))
    assert gb.scene_stride == 8
    adj = np.asarray(gb.scene_adj)
    assert adj[0, 2] == 1 and adj[0, 3] == 0  # banded
