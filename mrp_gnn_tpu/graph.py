"""Static-shape robot-graph batching for XLA.

The reference builds a dense per-scene adjacency over N<=5 robots inside its
model code (SURVEY.md section 2.1 "Graph builder / batcher", reconstructed —
reference mount empty). For TPU we instead flatten a batch of scene graphs
into one padded edge list with static shapes so a single jitted program
handles every batch:

- nodes   = robot views of all scenes, laid out contiguously per scene and
  padded to ``max_nodes``;
- edges   = directed (src -> dst) robot-pair edges within each scene, sorted
  by destination, padded to ``max_edges``;
- masks   = validity of each node / edge slot.

Padded edge slots point at node slot 0 but carry ``edge_mask == False``; all
ops in :mod:`mrp_gnn_tpu.ops` are mask-aware so padding never changes results
(property-tested in tests/test_graph.py, tests/test_ops.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["edge_src", "edge_dst", "node_mask", "edge_mask",
                      "node_scene", "n_nodes", "n_edges", "scene_adj",
                      "ell_src", "ell_mask", "bsp_pair_dst", "bsp_pair_src",
                      "bsp_pair_first", "bsp_pair_last", "bsp_pair_dst_t",
                      "bsp_pair_src_t", "bsp_pair_first_t", "bsp_pair_last_t",
                      "partition_plan", "bsp_expanded"],
         meta_fields=["scene_stride", "bsp_tile"])
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A batch of scene graphs flattened into one padded graph.

    All arrays have static shapes; jit-stable across batches.

    Attributes:
      edge_src: int32[max_edges] source node slot of each directed edge.
      edge_dst: int32[max_edges] destination node slot, NON-DECREASING over
        valid edges (edges are sorted by destination; padding sits at the end
        with dst == 0 and mask False).
      node_mask: bool[max_nodes] validity of each node slot.
      edge_mask: bool[max_edges] validity of each edge slot.
      node_scene: int32[max_nodes] scene id of each node (0 for padding).
      n_nodes: int32 scalar, number of valid nodes.
      n_edges: int32 scalar, number of valid edges.
      scene_stride: static int. When > 0 the batch is BLOCK-DIAGONAL: every
        scene has the same topology and node i of scene s sits at slot
        s * scene_stride + i (max_nodes a multiple of the stride). This
        unlocks the dense block fusion path (batched masked attention on the
        MXU) instead of edge-list gather/scatter — the TPU-native fast path.
      scene_adj: float32 [stride, stride] shared per-scene adjacency
        (adj[dst, src] = 1.0 for an edge), or None when scene_stride == 0.
    """

    edge_src: jax.Array
    edge_dst: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    node_scene: jax.Array
    n_nodes: jax.Array
    n_edges: jax.Array
    scene_adj: jax.Array | None = None
    scene_stride: int = 0
    # ELL (padded neighbour-list) view of the same edges, the TPU-idiomatic
    # sparse layout: ell_src int32 [V, max_deg] source of in-edge j of node v
    # (0 for padding), ell_mask bool [V, max_deg]. Regularizes gathers and
    # removes scatters entirely; built by build_graph_batch.
    ell_src: jax.Array | None = None
    ell_mask: jax.Array | None = None
    # Block-sparse pair plan over (dst tile, src tile) node tiles of width
    # bsp_tile (0 = no plan): for every destination tile, the source tiles
    # its in-edges touch, flattened dst-major. Drives the tile-block-sparse
    # Pallas fused-attention kernels (ops/pallas_bsp.py): value rows stream
    # as SEQUENTIAL whole-tile DMAs and edge selection happens on-chip via
    # one-hot MXU matmuls — no per-row descriptors, traffic proportional to
    # touched tiles instead of E. pair_first/last mark tile-group bounds
    # (int32 0/1) for accumulator reset / output writeback.
    bsp_pair_dst: jax.Array | None = None
    bsp_pair_src: jax.Array | None = None
    bsp_pair_first: jax.Array | None = None
    bsp_pair_last: jax.Array | None = None
    # Src-major re-sort of the same pair set (derive_bsp_pairs_t) driving the
    # TRANSPOSED block-sparse SpMM in the backward kernels: dvalues/dk
    # accumulate per SOURCE tile, so first/last mark source-group bounds.
    bsp_pair_dst_t: jax.Array | None = None
    bsp_pair_src_t: jax.Array | None = None
    bsp_pair_first_t: jax.Array | None = None
    bsp_pair_last_t: jax.Array | None = None
    bsp_tile: int = 0
    # Per-batch edge-partition plan (parallel/partition.py EdgePartitionPlan,
    # stacked over data replicas) — attached by the dynamic-topology
    # partitioned path so the plan rides the batch pytree into the jitted
    # step. None for static-topology runs (the plan is compiled in).
    partition_plan: object | None = None
    # High-degree extension (docs/kernels.md "Degree cap"): when the ELL
    # width exceeds the BSP kernels' 128-column unroll cap, a row-expanded
    # plan over the RECTANGULAR (V*rows dst, V src) tile space lets the same
    # kernels run — see BspExpandedPlan / build_expanded_bsp. None when the
    # graph is within the cap (or has no BSP plan at all).
    bsp_expanded: "BspExpandedPlan | None" = None

    @property
    def max_degree(self) -> int:
        if self.ell_src is None:
            raise ValueError("graph has no ELL layout")
        return self.ell_src.shape[1]

    @property
    def max_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def max_edges(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def num_scene_blocks(self) -> int:
        if not self.scene_stride:
            raise ValueError("graph has no block-diagonal layout")
        return self.max_nodes // self.scene_stride


@partial(jax.tree_util.register_dataclass,
         data_fields=["pair_dst", "pair_src", "pair_first", "pair_last",
                      "pair_dst_t", "pair_src_t", "pair_first_t",
                      "pair_last_t"],
         meta_fields=["rows", "width"])
@dataclasses.dataclass(frozen=True)
class BspExpandedPlan:
    """Row-expanded tile-pair plan for ELL widths past the kernels' 128-
    column unroll cap (docs/kernels.md "Degree cap and the designed
    extension").

    The [V, deg] neighbour list is viewed as [V*rows, width] (row-major:
    node v's list splits across expanded rows v*rows .. v*rows+rows-1), and
    the UNCHANGED BSP kernels run over the rectangular (V*rows dst, V src)
    tile space: pair_dst indexes expanded-destination tiles, pair_src
    original source tiles. Linear aggregations reshape-sum the [V*rows, D]
    partials; attention composes expanded SDDMM -> row softmax on the
    re-folded [V, rows*width] logits -> expanded SpMM
    (ops/pallas_bsp.py attention_expanded). The transposed (src-major)
    arrays drive the backward kernels, whose outputs have V rows.
    """

    pair_dst: jax.Array
    pair_src: jax.Array
    pair_first: jax.Array
    pair_last: jax.Array
    pair_dst_t: jax.Array
    pair_src_t: jax.Array
    pair_first_t: jax.Array
    pair_last_t: jax.Array
    rows: int
    width: int


def expanded_ell_shape(deg: int, cap: int = 128) -> tuple[int, int]:
    """(rows, width) of the row-expanded view of an ELL width ``deg``:
    the fewest expansion rows keeping width <= cap, width rounded up to a
    lane-friendly multiple of 8 (padding columns are mask-False)."""
    rows = -(-deg // cap)
    width = _round_up_int(-(-deg // rows), 8)
    return rows, width


def build_expanded_bsp(ell_src: np.ndarray, ell_mask: np.ndarray,
                       tile: int, cap: int = 128,
                       max_pairs: int | None = None,
                       to_device: bool = True) -> BspExpandedPlan:
    """Host-side expanded tile-pair plan for a high-degree ELL layout.

    Pure layout derivation: the expanded neighbour-list arrays themselves
    are never stored — ops re-derive them from ell_src/ell_mask with a pad
    + reshape at trace time (cheap, fused by XLA), guaranteed to match this
    builder because both use the same row-major [V, rows*width] view.

    ``max_pairs`` pins the plan length for dynamic streams (same inert-
    padding/violation protocol as build_bsp_pairs). UNLIKE the square
    plan, the expanded plan length is NOT subset-monotone — ELL packing
    re-ranks a subgraph's neighbour list, so a sparse row can touch source
    tiles the full graph's same rank range never does (docs/kernels.md
    "Degree cap") — so the full-connectivity plan length is NOT a sound
    cap. Callers must bound their own topology family (and a violating
    batch raises here, at plan build).
    """
    V, deg = ell_src.shape
    rows, width = expanded_ell_shape(deg, cap)
    pad = rows * width - deg
    src_x = np.pad(np.asarray(ell_src), ((0, 0), (0, pad))).reshape(
        V * rows, width)
    mask_x = np.pad(np.asarray(ell_mask), ((0, 0), (0, pad))).reshape(
        V * rows, width)
    nt_src = V // tile
    pairs = build_bsp_pairs(src_x, mask_x, tile, max_pairs=max_pairs,
                            num_src_tiles=nt_src, to_device=to_device)
    pairs_t = derive_bsp_pairs_t(
        pairs[0], pairs[1], pairs[3], nt_src,
        max_pairs=bsp_pairs_t_capacity(max_pairs, nt_src))
    conv = jnp.asarray if to_device else np.asarray
    return BspExpandedPlan(
        pair_dst=pairs[0], pair_src=pairs[1],
        pair_first=pairs[2], pair_last=pairs[3],
        pair_dst_t=conv(pairs_t[0]), pair_src_t=conv(pairs_t[1]),
        pair_first_t=conv(pairs_t[2]),
        pair_last_t=conv(pairs_t[3]),
        rows=rows, width=width)


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _warn_hideg_fallback(width: int, partitioned: bool = False) -> None:
    """Warn (once per process — the default warnings dedup) when a
    capacity-pinned batch/plan crosses the 128-degree kernel cap WITHOUT
    the expanded-plan opt-in: the aggregation silently drops from the
    row-expanded Pallas kernels to the XLA gather league (~5-10x slower,
    and prone to OOM at swarm scale — BASELINE.md round 4). The opt-in is
    explicit because the expanded-plan length is not subset-monotone, so
    no sound automatic capacity exists (docs/kernels.md 'Degree cap')."""
    import warnings
    if partitioned:
        optin = ("Set PlanCapacities.xp_pairs=<bound for your topology "
                 "family> (ParallelConfig.expanded_plan_pairs from the "
                 "config path) to keep the partitioned local aggregate on "
                 "the expanded kernels")
        what = "per-shard local in-degree width"
    else:
        optin = ("Pass max_expanded_pairs=<bound for your topology family> "
                 "to batch_from_positions/build_graph_batch to opt in")
        what = "graph batch in-degree width"
    warnings.warn(
        f"{what} {width} exceeds the 128-column kernel cap but carries no "
        "row-expanded plan: capacity-pinned (dynamic) streams build one "
        "only with an explicit opt-in, so edge aggregation falls back to "
        f"the XLA gather path (~5-10x slower; can OOM at swarm scale). "
        f"{optin} (docs/kernels.md 'Degree cap and the row-expansion "
        "extension').",
        UserWarning, stacklevel=3)


def fully_connected_edges(num_robots: int, self_loops: bool = False) -> np.ndarray:
    """Directed edge list of the fully-connected robot team graph.

    The reference connects every robot pair within a scene (BASELINE.json:9,
    "5-robot fully-connected graph"). Returns int32 [2, E] (src, dst).
    """
    src, dst = [], []
    for i in range(num_robots):
        for j in range(num_robots):
            if i == j and not self_loops:
                continue
            src.append(j)
            dst.append(i)
    if not src:
        return np.zeros((2, 0), np.int32)
    return np.stack([np.array(src, np.int32), np.array(dst, np.int32)])


def radius_edges(num_robots: int, radius: int,
                 self_loops: bool = False) -> np.ndarray:
    """Communication-range graph: robots i, j connected iff |i - j| <= radius.

    Models the reference's "fully connected within communication range"
    (SURVEY.md section 0) for robots spread along the camera baseline (the
    synthetic generator places robot i at offset i — see data/synthetic.py);
    index distance is proportional to physical distance. Returns [2, E].
    """
    src, dst = [], []
    for i in range(num_robots):
        for j in range(num_robots):
            if i == j and not self_loops:
                continue
            if abs(i - j) <= radius:
                src.append(j)
                dst.append(i)
    if not src:
        return np.zeros((2, 0), np.int32)
    return np.stack([np.array(src, np.int32), np.array(dst, np.int32)])


def positions_radius_edges(positions: np.ndarray, radius: float,
                           self_loops: bool = False) -> np.ndarray:
    """Metric communication-range graph from robot positions.

    positions: [N] (baseline offsets) or [N, d] coordinates. Edge j -> i iff
    ||p_i - p_j|| <= radius, i != j. Returns [2, E] (src, dst) int32. This is
    the dynamic-swarm counterpart of :func:`radius_edges`: as robots move,
    the communication graph changes per scene (SURVEY.md section 0 "fully
    connected within communication range" — positions now vary).
    """
    p = np.asarray(positions, np.float64)
    if p.ndim == 1:
        p = p[:, None]
    d = np.linalg.norm(p[None, :, :] - p[:, None, :], axis=-1)  # d[i, j]
    adj = d <= radius
    if not self_loops:
        np.fill_diagonal(adj, False)
    dst, src = np.nonzero(adj)  # adj[i, j]: edge j -> i
    return np.stack([src.astype(np.int32), dst.astype(np.int32)])


def batch_from_positions(
    scene_positions: Sequence[np.ndarray],
    radius: float,
    max_nodes: int,
    max_edges: int,
    max_degree: int,
    max_bsp_pairs: int | None = None,
    max_expanded_pairs: int | None = None,
    backend: str = "auto",
) -> GraphBatch:
    """Per-batch GraphBatch from per-scene robot positions (dynamic swarms).

    Every capacity is pinned so consecutive batches share one set of array
    shapes (one jit compile) while the topology underneath changes freely.
    backend: "auto" uses the native C++ plan builder when available
    (native/graphbuild.cc), "numpy" forces the Python path — both produce
    bit-identical plans (tests/test_graph_native.py).
    """
    if backend in ("auto", "native"):
        from mrp_gnn_tpu.data import graph_native
        gb = graph_native.batch_from_positions_native(
            scene_positions, radius, max_nodes, max_edges, max_degree,
            max_bsp_pairs, max_expanded_pairs=max_expanded_pairs)
        if gb is not None:
            if (gb.bsp_tile > 0 and gb.ell_src.shape[1] > 128
                    and gb.bsp_expanded is None):
                _warn_hideg_fallback(int(gb.ell_src.shape[1]))
            return gb
        if backend == "native":
            raise RuntimeError("native graph builder requested but the "
                               "shared library could not be built/loaded")
    edges = [positions_radius_edges(p, radius) for p in scene_positions]
    return build_graph_batch(edges, [len(p) for p in scene_positions],
                             max_nodes=max_nodes, max_edges=max_edges,
                             max_degree=max_degree,
                             max_bsp_pairs=max_bsp_pairs,
                             max_expanded_pairs=max_expanded_pairs)


def scene_edges_for(num_robots: int, connectivity: str = "full",
                    comm_radius: int = 0, self_loops: bool = False) -> np.ndarray:
    """Edge list for one scene by connectivity kind: "full" | "radius"."""
    if connectivity == "full":
        return fully_connected_edges(num_robots, self_loops)
    if connectivity == "radius":
        if comm_radius <= 0:
            raise ValueError("radius connectivity needs comm_radius > 0")
        return radius_edges(num_robots, comm_radius, self_loops)
    raise ValueError(f"unknown connectivity {connectivity!r}")


def build_graph_batch(
    scene_edges: Sequence[np.ndarray],
    scene_num_nodes: Sequence[int],
    max_nodes: int,
    max_edges: int,
    max_degree: int | None = None,
    max_bsp_pairs: int | None = None,
    max_expanded_pairs: int | None = None,
) -> GraphBatch:
    """Flatten per-scene edge lists into one padded, dst-sorted GraphBatch.

    Args:
      scene_edges: per scene, int [2, E_s] (src, dst) in scene-local ids.
      scene_num_nodes: per scene, number of robot nodes.
      max_nodes / max_edges: static padded capacities.
      max_degree: pin the ELL width to this capacity (rounded up to 8) —
        pass it when topology varies per batch (dynamic swarms) so every
        batch has identical array shapes and one jit compile serves all.
      max_bsp_pairs: likewise pin the tile-pair plan length (padded with
        inert pairs the kernels skip over).
      max_expanded_pairs: pin the HIGH-DEGREE row-expanded plan length
        (ELL width > 128) for dynamic streams — the full-connectivity
        graph's expanded plan bounds every topology under the capacity.
    """
    srcs, dsts, scenes = [], [], []
    offset = 0
    for sid, (edges, n) in enumerate(zip(scene_edges, scene_num_nodes)):
        if edges.size:
            if edges.max() >= n:
                raise ValueError(f"scene {sid}: edge index {edges.max()} >= {n} nodes")
            srcs.append(edges[0].astype(np.int64) + offset)
            dsts.append(edges[1].astype(np.int64) + offset)
        scenes.append(np.full(n, sid, np.int32))
        offset += n
    n_nodes = offset
    if n_nodes > max_nodes:
        raise ValueError(f"{n_nodes} nodes > max_nodes={max_nodes}")
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    n_edges = src.shape[0]
    if n_edges > max_edges:
        raise ValueError(f"{n_edges} edges > max_edges={max_edges}")

    # Sort by destination (stable: keeps src order within a segment) so
    # segment ops and the Pallas kernels see contiguous dst segments.
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]

    pad_e = max_edges - n_edges
    edge_src = np.concatenate([src, np.zeros(pad_e, np.int64)]).astype(np.int32)
    edge_dst = np.concatenate([dst, np.zeros(pad_e, np.int64)]).astype(np.int32)
    edge_mask = np.arange(max_edges) < n_edges
    node_mask = np.arange(max_nodes) < n_nodes
    node_scene = np.concatenate(
        [np.concatenate(scenes) if scenes else np.zeros(0, np.int32),
         np.zeros(max_nodes - n_nodes, np.int32)]
    )
    # ELL view: per-destination padded neighbour lists (edges are dst-sorted,
    # so this is a cheap segment split). Width rounded up to a multiple of 8
    # for VPU-friendly tiling, minimum 8.
    deg = np.bincount(dst, minlength=max_nodes) if n_edges else np.zeros(max_nodes, np.int64)
    max_deg = max(_round_up_int(int(deg.max()) if deg.size else 1, 8), 8)
    if max_degree is not None:
        cap = max(_round_up_int(max_degree, 8), 8)
        if max_deg > cap:
            raise ValueError(f"max in-degree {int(deg.max())} exceeds "
                             f"max_degree capacity {max_degree}")
        max_deg = cap
    ell_src = np.zeros((max_nodes, max_deg), np.int32)
    ell_mask = np.zeros((max_nodes, max_deg), bool)
    if n_edges:
        # dst is sorted; slot = edge rank within its destination segment
        # (vectorized: edge position minus the segment's first position).
        starts = np.searchsorted(dst, np.arange(max_nodes))
        slot = np.arange(dst.size) - starts[dst]
        ell_src[dst, slot] = src
        ell_mask[dst, slot] = True

    # Tile-pair plan for the block-sparse fused kernels. 128 (the MXU/VPU
    # lane width) beat 256 in the chip sweep: the one-hot A build is
    # O(tile^2 * deg) per pair, so smaller square tiles waste less VPU work
    # for the same streamed bytes (BASELINE.md).
    bsp_tile = 0
    pairs = (None,) * 4
    pairs_t = (None,) * 4
    expanded = None
    for t in (128, 256, 64, 32, 16, 8):
        if max_nodes % t == 0:
            bsp_tile = t
            if max_deg > 128:
                # Past the kernels' 128-column unroll cap: build the row-
                # expanded rectangular plan instead (docs/kernels.md) —
                # unpinned for static graphs, pinned via
                # max_expanded_pairs for dynamic capacity streams (a
                # dynamic stream WITHOUT the expanded cap falls back to
                # the XLA gather path).
                if max_expanded_pairs is not None:
                    expanded = build_expanded_bsp(
                        ell_src, ell_mask, t, max_pairs=max_expanded_pairs)
                elif max_bsp_pairs is None and max_degree is None:
                    expanded = build_expanded_bsp(ell_src, ell_mask, t)
                else:
                    _warn_hideg_fallback(max_deg)
                break
            pairs = build_bsp_pairs(ell_src, ell_mask, t,
                                    max_pairs=max_bsp_pairs)
            nt = max_nodes // t
            pairs_t = derive_bsp_pairs_t(
                pairs[0], pairs[1], pairs[3], nt,
                max_pairs=bsp_pairs_t_capacity(max_bsp_pairs, nt))
            break

    return GraphBatch(
        edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        node_scene=jnp.asarray(node_scene),
        n_nodes=jnp.asarray(n_nodes, jnp.int32),
        n_edges=jnp.asarray(n_edges, jnp.int32),
        ell_src=jnp.asarray(ell_src),
        ell_mask=jnp.asarray(ell_mask),
        bsp_pair_dst=pairs[0],
        bsp_pair_src=pairs[1],
        bsp_pair_first=pairs[2],
        bsp_pair_last=pairs[3],
        bsp_pair_dst_t=(jnp.asarray(pairs_t[0])
                        if pairs_t[0] is not None else None),
        bsp_pair_src_t=(jnp.asarray(pairs_t[1])
                        if pairs_t[1] is not None else None),
        bsp_pair_first_t=(jnp.asarray(pairs_t[2])
                          if pairs_t[2] is not None else None),
        bsp_pair_last_t=(jnp.asarray(pairs_t[3])
                         if pairs_t[3] is not None else None),
        bsp_tile=bsp_tile,
        bsp_expanded=expanded,
    )


def build_bsp_pairs(ell_src: np.ndarray, ell_mask: np.ndarray, tile: int,
                    max_pairs: int | None = None,
                    num_src_tiles: int | None = None,
                    to_device: bool = True):
    """Host-side (dst tile, src tile) pair plan for the block-sparse kernels.

    Returns (pair_dst, pair_src, pair_first, pair_last) int32 arrays, pairs
    grouped by destination tile in ascending order. Every dst tile gets at
    least one pair (its diagonal) so the first/last accumulator protocol
    always fires.

    When ``max_pairs`` is set the plan is padded to that static length with
    inert trailing pairs (first=0, last=0): the kernels' emission fires only
    on last=1, so inert steps can only touch the already-emitted accumulator
    of the final tile and never change any output (tests/test_pallas_bsp.py
    padded-plan cases).

    ``num_src_tiles`` bounds the RECTANGULAR case (row-expanded plans have
    more destination tiles than source tiles): the edge-less dst tile
    fallback must still name a valid source tile.
    """
    src = np.asarray(ell_src)
    mask = np.asarray(ell_mask)
    V, W = src.shape
    nt = V // tile
    nts = num_src_tiles if num_src_tiles is not None else nt
    # Vectorized (dst tile, src tile) incidence via one bincount over the
    # dense nt x nts key space — identical output to the per-tile loop
    # (pairs ascending by dst then src; diagonal fallback for edge-less
    # dst tiles), but O(E) numpy instead of Python set ops per tile: the
    # dynamic opt-in expanded path builds this per batch on the producer
    # thread (48 ms -> ~2 ms at 32x256 swarm scale).
    flat = np.flatnonzero(mask.ravel())
    # row of entry e = e // W; dst tile = row // tile => one division
    key = (flat // (W * tile)) * nts + src.ravel()[flat] // tile
    cnt = np.bincount(key, minlength=nt * nts)
    pd_a, ps_a = np.nonzero(cnt.reshape(nt, nts))  # row-major => dst-major
    present = np.zeros(nt, bool)
    present[pd_a] = True
    missing = np.nonzero(~present)[0]
    if missing.size:  # edge-less dst tile: diagonal fallback
        pd_a = np.concatenate([pd_a, missing])
        ps_a = np.concatenate([ps_a, np.minimum(missing, nts - 1)])
        order = np.lexsort((ps_a, pd_a))
        pd_a, ps_a = pd_a[order], ps_a[order]
    fi_a = np.empty(pd_a.shape[0], np.int32)
    fi_a[0] = 1
    fi_a[1:] = (np.diff(pd_a) != 0).astype(np.int32)
    la_a = np.empty_like(fi_a)
    la_a[:-1] = fi_a[1:]
    la_a[-1] = 1
    if max_pairs is not None:
        n = pd_a.shape[0]
        if n > max_pairs:
            raise ValueError(f"{n} tile pairs exceed max_bsp_pairs="
                             f"{max_pairs}")
        pad = max_pairs - n
        pd_a = np.concatenate([pd_a, np.full(pad, nt - 1)])
        ps_a = np.concatenate([ps_a, np.full(pad, nts - 1)])
        fi_a = np.concatenate([fi_a, np.zeros(pad, np.int32)])
        la_a = np.concatenate([la_a, np.zeros(pad, np.int32)])
    out = (pd_a.astype(np.int32), ps_a.astype(np.int32),
           fi_a.astype(np.int32), la_a.astype(np.int32))
    # to_device=False keeps numpy leaves (the native builder's policy: the
    # host->device copy is left to jit dispatch, pipelined with compute).
    return tuple(map(jnp.asarray, out)) if to_device else out


def bsp_pairs_t_capacity(max_bsp_pairs: int | None, nt: int) -> int | None:
    """Static length of the transposed plan under a pinned dst-major cap.

    The transposed plan holds the same real pair set plus at most one
    diagonal fallback per source-less tile, so dst-cap + nt bounds it for
    every topology sharing the capacity — keeping dynamic-stream shapes
    batch-invariant."""
    return None if max_bsp_pairs is None else max_bsp_pairs + nt


def derive_bsp_pairs_t(pair_dst, pair_src, pair_last, nt: int,
                       max_pairs: int | None = None):
    """Src-major re-sort of a (possibly inert-padded) tile-pair plan.

    Drives the TRANSPOSED block-sparse SpMM (ops/pallas_bsp.py backward
    kernels): ``dvalues[s] += A(pair)^T @ g[dst]`` accumulates per SOURCE
    tile, so pairs are regrouped by source tile ascending with first/last
    marking source-group bounds. Every source tile gets at least one pair
    (diagonal fallback — its selection matrix is empty, so it emits exactly
    zero) because each output tile must be written exactly once. Inert
    padding pairs point at (nt-1, nt-1) with first=last=0, the same
    protocol as :func:`build_bsp_pairs`.

    Derived purely from the dst-major plan arrays so the native C++ builder
    (native/graphbuild.cc) needs no mirror implementation; cost is a lexsort
    of a tiny array. Returns four int32 numpy arrays.
    """
    pd = np.asarray(pair_dst)
    ps = np.asarray(pair_src)
    la = np.asarray(pair_last)
    nz = np.nonzero(la)[0]
    real = int(nz[-1]) + 1 if nz.size else 0  # inert tail has last == 0
    order = np.lexsort((pd[:real], ps[:real]))
    spd, sps = pd[:real][order], ps[:real][order]
    starts = np.searchsorted(sps, np.arange(nt))
    ends = np.searchsorted(sps, np.arange(nt), side="right")
    pd2, ps2, fi2, la2 = [], [], [], []
    for s in range(nt):
        i, j = int(starts[s]), int(ends[s])
        if i == j:  # source-less tile: diagonal fallback emits zeros
            pd2.append(s)
            ps2.append(s)
            fi2.append(1)
            la2.append(1)
            continue
        pd2.extend(spd[i:j].tolist())
        ps2.extend([s] * (j - i))
        fi2.extend([1] + [0] * (j - i - 1))
        la2.extend([0] * (j - i - 1) + [1])
    if max_pairs is not None:
        if len(pd2) > max_pairs:
            raise ValueError(f"{len(pd2)} transposed tile pairs exceed "
                             f"max_pairs={max_pairs}")
        pad = max_pairs - len(pd2)
        pd2 += [nt - 1] * pad
        ps2 += [nt - 1] * pad
        fi2 += [0] * pad
        la2 += [0] * pad
    return (np.array(pd2, np.int32), np.array(ps2, np.int32),
            np.array(fi2, np.int32), np.array(la2, np.int32))


def batch_homogeneous(
    num_scenes: int,
    robots_per_scene: int,
    edges: np.ndarray,
    max_nodes: int | None = None,
    max_edges: int | None = None,
) -> GraphBatch:
    """GraphBatch for ``num_scenes`` scenes sharing one topology ``edges``.

    When max_nodes is a multiple of the scene size, the batch is tagged
    block-diagonal (scene_stride / scene_adj), enabling the dense MXU fusion
    path for ANY shared per-scene topology (fully-connected, radius, ...).
    """
    n_nodes = num_scenes * robots_per_scene
    n_edges = num_scenes * edges.shape[1]
    gb = build_graph_batch(
        [edges] * num_scenes,
        [robots_per_scene] * num_scenes,
        max_nodes=max_nodes or n_nodes,
        max_edges=max_edges or max(n_edges, 1),
    )
    n = robots_per_scene
    if gb.max_nodes % n == 0:
        adj = np.zeros((n, n), np.float32)
        adj[edges[1], edges[0]] = 1.0  # adj[dst, src]
        gb = dataclasses.replace(gb, scene_adj=jnp.asarray(adj),
                                 scene_stride=n)
    return gb


def batch_fully_connected(
    num_scenes: int,
    robots_per_scene: int,
    max_nodes: int | None = None,
    max_edges: int | None = None,
    self_loops: bool = False,
) -> GraphBatch:
    """GraphBatch for ``num_scenes`` identical fully-connected teams."""
    return batch_homogeneous(
        num_scenes, robots_per_scene,
        fully_connected_edges(robots_per_scene, self_loops),
        max_nodes=max_nodes, max_edges=max_edges)
