"""Edge partitioning of batched robot graphs across the mesh "graph" axis.

The contract's centerpiece (BASELINE.json:5, SURVEY.md section 2.3): large
batched swarm graphs are edge-partitioned across devices; boundary robot
features are exchanged over ICI and overlapped with local aggregation.

Layout chosen here (destination-owner partitioning):
- nodes are block-sharded: shard p owns node slots [p*nps, (p+1)*nps);
- every edge lives on the shard that owns its DESTINATION, so (a) the
  segment-softmax over a node's in-edges is entirely shard-local, and (b)
  the scatter-add of messages never crosses devices;
- an edge whose SOURCE is off-shard is a *boundary* edge: its source value
  vector arrives via the boundary exchange, while local-source edges
  aggregate straight from the resident block — the two partial aggregates
  are summed, letting XLA overlap the collective with the local work.

Boundary exchange = per-delta ppermute halo rings: for each ACTIVE shard
offset d (a (receiver - sender) mod P with at least one requested row
anywhere on the ring), every shard ships the exact rows its (p+d)-peer's
boundary edges reference. Traffic per shard is sum_d B_d rows — proportional
to the real boundary set, NOT to V (the all_gather legacy) and NOT to
(P-1) x max-pair (a uniform all_to_all): a radius-connectivity swarm whose
scenes straddle two shards activates only deltas +-1.

The plan is computed once on host (topology is static across steps).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mrp_gnn_tpu.graph import GraphBatch


@partial(jax.tree_util.register_dataclass,
         data_fields=["src_global", "dst_local", "mask", "local_mask",
                      "send_idx", "remote_dst", "remote_src_global",
                      "remote_slot", "remote_mask", "remote_ell_slot",
                      "remote_ell_srcg", "remote_ell_mask", "ell_src",
                      "ell_mask",
                      "bsp_pair_dst", "bsp_pair_src", "bsp_pair_first",
                      "bsp_pair_last", "bsp_pair_dst_t", "bsp_pair_src_t",
                      "bsp_pair_first_t", "bsp_pair_last_t",
                      "xp_pair_dst", "xp_pair_src", "xp_pair_first",
                      "xp_pair_last", "xp_pair_dst_t", "xp_pair_src_t",
                      "xp_pair_first_t", "xp_pair_last_t"],
         meta_fields=["num_shards", "nodes_per_shard", "deltas", "delta_rows",
                      "bsp_tile", "xp_rows", "xp_width"])
@dataclasses.dataclass(frozen=True)
class EdgePartitionPlan:
    """Per-shard padded edge lists, stacked on a leading shard axis.

    src_global: int32 [P, E_s] global source node slot.
    dst_local:  int32 [P, E_s] destination slot local to the owning shard.
    mask:       bool  [P, E_s] slot validity.
    local_mask: bool  [P, E_s] valid AND source resident on this shard.

    Local-edge ELL layout (the per-shard fast path — local edges are the
    bulk of a radius swarm, and the ELL neighbour-list form aggregates via
    regular gathers / the tile-block-sparse Pallas kernels instead of
    edge-list scatter-adds):

    ell_src:  int32 [P, nps, L] shard-LOCAL source slot of each local
              in-edge of each local destination row (0-padded).
    ell_mask: bool  [P, nps, L] slot validity.

    bsp_*: per-shard tile-pair plans for the block-sparse Pallas SpMM
    (ops/pallas_bsp.py), stacked and padded to a common pair count with
    inert (dst=0, src=0, first=0, last=0) tail pairs. bsp_tile = 0 when no
    MXU-friendly tile divides nodes_per_shard.

    Boundary-exchange plan (the contract's "boundary robot features exchanged
    all-to-all over ICI", BASELINE.json:5), as per-delta halo rings:

    deltas:      static tuple of active shard offsets d (1..P-1): shard s
                 sends to shard (s + d) % P.
    delta_rows:  static tuple, B_d = padded max rows any shard ships along
                 delta d. The receive buffer is the concat over deltas,
                 sum(delta_rows) rows total.
    send_idx:    int32 [P, sum(B_d)]. send_idx[s, off_d : off_d + B_d] =
                 sender-LOCAL row indices shard s ships along delta d
                 (0-padded) — i.e. the rows shard (s+d)%P requested from s.

    Compact remote (boundary) edge arrays — the edge-list scatter path only
    runs over these, so its cost is O(boundary edges), not O(E_s):

    remote_dst:        int32 [P, E_r] local destination of each boundary edge.
    remote_src_global: int32 [P, E_r] global source (for the all_gather mode).
    remote_slot:       int32 [P, E_r] index of the edge's source row in the
                       per-shard receive buffer (concat over deltas in
                       ``deltas`` order).
    remote_mask:       bool  [P, E_r] slot validity.
    """

    src_global: jax.Array
    dst_local: jax.Array
    mask: jax.Array
    local_mask: jax.Array
    send_idx: jax.Array
    remote_dst: jax.Array
    remote_src_global: jax.Array
    remote_slot: jax.Array
    remote_mask: jax.Array
    # ELL (padded neighbour-list) view of the SAME boundary edges, so the
    # remote aggregation runs as regular gathers + row reductions instead of
    # an edge-list scatter-add (round 3; the last scatter in the partitioned
    # path): remote_ell_slot indexes the per-delta receive buffer,
    # remote_ell_srcg the global node axis (the all_gather A/B mode).
    remote_ell_slot: jax.Array
    remote_ell_srcg: jax.Array
    remote_ell_mask: jax.Array
    ell_src: jax.Array
    ell_mask: jax.Array
    bsp_pair_dst: jax.Array | None
    bsp_pair_src: jax.Array | None
    bsp_pair_first: jax.Array | None
    bsp_pair_last: jax.Array | None
    # Src-major re-sort per shard (graph.derive_bsp_pairs_t) for the
    # transposed block-sparse SpMM in the Pallas backward kernels.
    bsp_pair_dst_t: jax.Array | None
    bsp_pair_src_t: jax.Array | None
    bsp_pair_first_t: jax.Array | None
    bsp_pair_last_t: jax.Array | None
    # Per-shard ROW-EXPANDED rectangular tile-pair plans (round 5) for
    # local ELL widths past the kernels' 128-column cap: destination-owner
    # partitioning keeps a node's FULL in-degree inside its shard, so a
    # deg>128 swarm composes high degree WITH partitioning — the local
    # aggregate then rides the expanded kernels (pallas_bsp.xp_sddmm /
    # xp_weighted_aggregate over the [nps*xp_rows, xp_width] view of
    # ell_src) instead of dropping to the XLA gather league. Stacked
    # [P, n_xp] with inert tail pairs; None when the width is <= 128 (the
    # square plan applies) or for capacity streams without the
    # PlanCapacities.xp_pairs opt-in (expanded-plan length is not
    # subset-monotone — docs/kernels.md "Degree cap").
    xp_pair_dst: jax.Array | None
    xp_pair_src: jax.Array | None
    xp_pair_first: jax.Array | None
    xp_pair_last: jax.Array | None
    xp_pair_dst_t: jax.Array | None
    xp_pair_src_t: jax.Array | None
    xp_pair_first_t: jax.Array | None
    xp_pair_last_t: jax.Array | None
    num_shards: int
    nodes_per_shard: int
    deltas: tuple
    delta_rows: tuple
    bsp_tile: int
    xp_rows: int
    xp_width: int

    @property
    def edges_per_shard(self) -> int:
        return self.mask.shape[1]

    @property
    def recv_rows(self) -> int:
        """Rows received per shard per step over ICI (the boundary volume)."""
        return int(sum(self.delta_rows))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class PlanCapacities:
    """Static sizes pinning an EdgePartitionPlan's array shapes.

    Dynamic-topology streams (DataConfig.mobility > 0) build a NEW plan per
    batch; plans built under one PlanCapacities all share shapes and ring
    structure, so one compiled shard_map program serves the stream. A
    capacity is derived from a superset topology — for radius swarms, the
    full-connectivity graph of the same scene layout upper-bounds every
    per-shard count (edges, ELL width, boundary requests, tile pairs)
    componentwise.
    """
    edges_per_shard: int
    ell_width: int
    deltas: tuple
    delta_rows: tuple
    remote_edges: int
    bsp_pairs: int
    remote_ell_width: int = 0
    # The transposed plan's width is always bsp_pairs + nt (see
    # graph.bsp_pairs_t_capacity) — no separate capacity needed.
    # EXPLICIT opt-in pinned length for per-shard row-expanded plans when
    # ell_width > 128 (dynamic high-degree partitioned streams). 0 = no
    # expanded plans: the local aggregate falls back to the XLA gather
    # path (with a runtime warning). NOT derived by capacities_of — the
    # expanded-plan length is not subset-monotone (docs/kernels.md), so
    # only the caller can bound their topology family; a violating batch
    # raises at plan build.
    xp_pairs: int = 0


def capacities_of(plan: EdgePartitionPlan) -> PlanCapacities:
    """Capacities pinned by a superset plan. Deliberately does NOT set
    xp_pairs from the plan's expanded arrays: a superset topology's
    expanded-plan length does not bound subgraphs (non-subset-monotone
    ELL packing) — callers opt in via dataclasses.replace(caps,
    xp_pairs=N) with their own family bound."""
    return PlanCapacities(
        edges_per_shard=plan.edges_per_shard,
        ell_width=int(plan.ell_mask.shape[-1]),
        deltas=plan.deltas,
        delta_rows=plan.delta_rows,
        remote_edges=int(plan.remote_mask.shape[-1]),
        bsp_pairs=(int(plan.bsp_pair_dst.shape[-1])
                   if plan.bsp_pair_dst is not None else 0),
        remote_ell_width=int(plan.remote_ell_mask.shape[-1]),
    )


def _remote_ell_arrays(arrs: dict, nps: int,
                       capacities: PlanCapacities | None,
                       pad_multiple: int = 8) -> None:
    """Derive the remote-edge ELL view from the compact remote edge arrays
    (shared post-processing for the numpy AND native plan builders, so the
    C++ side needs no mirror). Boundary edges arrive dst-sorted per shard,
    so the slot of an edge is its rank within its destination's run."""
    r_dst = arrs["remote_dst"]
    r_mask = np.asarray(arrs["remote_mask"])
    P = r_dst.shape[0]
    max_deg = 1
    rows_per = []
    for p in range(P):
        rows = np.asarray(r_dst[p])[r_mask[p]]
        rows_per.append(rows)
        if rows.size:
            max_deg = max(max_deg, int(np.bincount(rows).max()))
    Lr = max(_round_up(max_deg, pad_multiple), pad_multiple)
    if capacities is not None and capacities.remote_ell_width:
        if Lr > capacities.remote_ell_width:
            raise ValueError(f"remote in-degree {max_deg} exceeds remote "
                             f"ELL capacity {capacities.remote_ell_width}")
        Lr = capacities.remote_ell_width
    slot_ell = np.zeros((P, nps, Lr), np.int32)
    srcg_ell = np.zeros((P, nps, Lr), np.int32)
    mask_ell = np.zeros((P, nps, Lr), bool)
    for p in range(P):
        rows = rows_per[p]
        if rows.size == 0:
            continue
        starts = np.searchsorted(rows, np.arange(nps))
        rank = np.arange(rows.size) - starts[rows]
        slot_ell[p, rows, rank] = np.asarray(arrs["remote_slot"][p])[r_mask[p]]
        srcg_ell[p, rows, rank] = np.asarray(
            arrs["remote_src_global"][p])[r_mask[p]]
        mask_ell[p, rows, rank] = True
    arrs["remote_ell_slot"] = slot_ell
    arrs["remote_ell_srcg"] = srcg_ell
    arrs["remote_ell_mask"] = mask_ell


_XP_KEYS = ("xp_pair_dst", "xp_pair_src", "xp_pair_first", "xp_pair_last",
            "xp_pair_dst_t", "xp_pair_src_t", "xp_pair_first_t",
            "xp_pair_last_t")


def _expanded_plan_arrays(arrs: dict,
                          capacities: PlanCapacities | None) -> None:
    """Derive per-shard row-expanded rectangular tile-pair plans when the
    local ELL width exceeds the kernels' 128-column cap (shared numpy
    post-processing for BOTH the numpy and native plan builders, like
    _remote_ell_arrays — bit-parity by construction).

    Static plans (capacities None) always build them; capacity-pinned
    dynamic streams need the PlanCapacities.xp_pairs opt-in (the expanded
    plan length is not subset-monotone, docs/kernels.md) and fall back to
    the ELL gather path with a runtime warning otherwise."""
    arrs.update({k: None for k in _XP_KEYS})
    arrs["xp_rows"] = 0
    arrs["xp_width"] = 0
    tile = arrs["bsp_tile"]
    L = int(arrs["ell_mask"].shape[-1])
    if not tile or L <= 128:
        return
    if capacities is not None and not capacities.xp_pairs:
        from mrp_gnn_tpu.graph import _warn_hideg_fallback
        _warn_hideg_fallback(L, partitioned=True)
        return
    from mrp_gnn_tpu.graph import build_expanded_bsp
    ell_src = np.asarray(arrs["ell_src"])
    ell_mask = np.asarray(arrs["ell_mask"])
    P = ell_src.shape[0]

    def build(max_pairs):
        return [build_expanded_bsp(ell_src[p], ell_mask[p], tile,
                                   max_pairs=max_pairs, to_device=False)
                for p in range(P)]

    fields = ("pair_dst", "pair_src", "pair_first", "pair_last",
              "pair_dst_t", "pair_src_t", "pair_first_t", "pair_last_t")
    if capacities is not None:
        per = build(int(capacities.xp_pairs))  # violations raise inside
        stacked = {f: np.stack([np.asarray(getattr(x, f)) for x in per])
                   for f in fields}
    else:
        # ONE build pass; shards are equalized to the max length by
        # manual inert-tail padding — bit-identical to a pinned rebuild
        # (build_bsp_pairs pads dst-major tails with the last dst/src
        # tile, derive_bsp_pairs_t pads with the last src tile; inert
        # first=last=0 pairs only revisit already-emitted output tiles).
        per = build(None)
        pmax = max(int(np.asarray(x.pair_dst).shape[0]) for x in per)
        rows = per[0].rows
        nps = int(ell_src.shape[1])
        nt_src = nps // tile
        nt_dst = (nps * rows) // tile
        fills = {"pair_dst": nt_dst - 1, "pair_src": nt_src - 1,
                 "pair_first": 0, "pair_last": 0,
                 "pair_dst_t": nt_src - 1, "pair_src_t": nt_src - 1,
                 "pair_first_t": 0, "pair_last_t": 0}
        lens = {f: (pmax if not f.endswith("_t") else pmax + nt_src)
                for f in fields}

        def pad(a, f):
            a = np.asarray(a)
            tail = np.full(lens[f] - a.shape[0], fills[f], np.int32)
            return np.concatenate([a, tail])

        stacked = {f: np.stack([pad(getattr(x, f), f) for x in per])
                   for f in fields}
    for k, f in zip(_XP_KEYS, fields):
        arrs[k] = stacked[f]
    arrs["xp_rows"] = per[0].rows
    arrs["xp_width"] = per[0].width


def partition_graph(graph: GraphBatch, num_shards: int,
                    pad_multiple: int = 8,
                    capacities: PlanCapacities | None = None
                    ) -> EdgePartitionPlan:
    """Build the static partition plan for a GraphBatch.

    Requires graph.max_nodes divisible by num_shards (pad the batch's
    max_nodes up when configuring — see DataConfig.max_nodes).
    capacities: pin every padded size (see PlanCapacities) so plans built
    across a dynamic stream share shapes; raises when the graph exceeds any
    capacity.
    """
    V = graph.max_nodes
    if V % num_shards:
        raise ValueError(f"max_nodes={V} not divisible by num_shards={num_shards}")
    nps = V // num_shards

    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    mask = np.asarray(graph.edge_mask)
    arrs = _plan_arrays(src[mask], dst[mask], nps, num_shards, pad_multiple,
                        capacities)
    return _wrap_plan(arrs, num_shards, nps)


def _wrap_plan(arrs: dict, num_shards: int, nps: int,
               to_jnp: bool = True) -> EdgePartitionPlan:
    import jax.numpy as jnp
    meta = {k: arrs.pop(k) for k in ("deltas", "delta_rows", "bsp_tile",
                                     "xp_rows", "xp_width")}
    conv = (lambda v: jnp.asarray(v)) if to_jnp else (lambda v: v)
    return EdgePartitionPlan(
        **{k: (conv(v) if v is not None else None) for k, v in arrs.items()},
        num_shards=num_shards, nodes_per_shard=nps, **meta)


def _plan_arrays(src: np.ndarray, dst: np.ndarray, nps: int, num_shards: int,
                 pad_multiple: int = 8,
                 capacities: PlanCapacities | None = None) -> dict:
    """numpy plan arrays for ONE replica's (masked) edge list."""
    owner = dst // nps
    counts = np.bincount(owner, minlength=num_shards)
    E_s = max(_round_up(int(counts.max()) if counts.size else 1, pad_multiple),
              pad_multiple)
    if capacities is not None:
        if E_s > capacities.edges_per_shard:
            raise ValueError(f"shard edge count {int(counts.max())} exceeds "
                             f"capacity {capacities.edges_per_shard}")
        E_s = capacities.edges_per_shard

    P = num_shards
    src_g = np.zeros((P, E_s), np.int32)
    dst_l = np.zeros((P, E_s), np.int32)
    m = np.zeros((P, E_s), bool)
    lm = np.zeros((P, E_s), bool)
    for p in range(P):
        sel = owner == p
        s, d = src[sel], dst[sel]
        # keep dst-sorted order (inherited from the globally sorted list)
        k = s.shape[0]
        src_g[p, :k] = s
        dst_l[p, :k] = d - p * nps
        m[p, :k] = True
        lm[p, :k] = (s // nps) == p

    # --- local-edge ELL layout (per shard, shard-local coordinates) ----------
    # Width = max local in-degree over all shards' rows, padded; 8-aligned so
    # the tile-block-sparse kernels get lane-friendly shapes.
    max_deg = 1
    for p in range(P):
        row = dst_l[p][m[p] & lm[p]]
        if row.size:
            max_deg = max(max_deg, int(np.bincount(row).max()))
    L = _round_up(max_deg, pad_multiple)
    if capacities is not None:
        if L > capacities.ell_width:
            raise ValueError(f"local in-degree {max_deg} exceeds ELL "
                             f"capacity {capacities.ell_width}")
        L = capacities.ell_width
    ell_src = np.zeros((P, nps, L), np.int32)
    ell_mask = np.zeros((P, nps, L), bool)
    for p in range(P):
        sel = m[p] & lm[p]
        rows, srcs = dst_l[p][sel], src_g[p][sel] - p * nps
        if rows.size == 0:
            continue
        # rows arrive dst-sorted; slot index = rank within the row
        # (vectorized: edge position minus its row's first position).
        starts = np.searchsorted(rows, np.arange(nps))
        slot = np.arange(rows.size) - starts[rows]
        ell_src[p, rows, slot] = srcs
        ell_mask[p, rows, slot] = True

    # --- boundary-exchange plan ---------------------------------------------
    # requests[p][r] = sorted unique GLOBAL rows shard p needs from shard r.
    requests = [[np.zeros(0, np.int64) for _ in range(P)] for _ in range(P)]
    for p in range(P):
        s = src[owner == p]
        s_owner = s // nps
        for r in range(P):
            if r == p:
                continue
            requests[p][r] = np.unique(s[s_owner == r])

    # Active deltas: d such that SOME shard pair (r -> p=(r+d)%P) exchanges.
    deltas, delta_rows = [], []
    for d in range(1, P):
        width = max(requests[p][(p - d) % P].size for p in range(P))
        if width:
            deltas.append(d)
            delta_rows.append(_round_up(int(width), pad_multiple))
    if capacities is not None:
        # ring structure is compiled in: use the capacity's delta set and
        # widths verbatim (a batch may under-fill or skip some of them).
        need = dict(zip(deltas, delta_rows))
        extra = set(need) - set(capacities.deltas)
        if extra:
            raise ValueError(f"active deltas {sorted(extra)} outside "
                             f"capacity deltas {capacities.deltas}")
        for d, bd in zip(capacities.deltas, capacities.delta_rows):
            if need.get(d, 0) > bd:
                raise ValueError(f"delta {d} needs {need[d]} rows > "
                                 f"capacity {bd}")
        deltas = list(capacities.deltas)
        delta_rows = list(capacities.delta_rows)
    total_b = max(sum(delta_rows), 1)  # >=1 so shapes stay non-empty

    send_idx = np.zeros((P, total_b), np.int32)
    rslot = np.zeros((P, E_s), np.int32)
    off = 0
    for d, bd in zip(deltas, delta_rows):
        for s_dev in range(P):
            p = (s_dev + d) % P
            need = requests[p][s_dev]
            send_idx[s_dev, off:off + need.size] = (
                need - s_dev * nps).astype(np.int32)
        off += bd
    # remote_slot: per boundary edge, position in the concat recv buffer.
    delta_off = {d: sum(delta_rows[:i]) for i, d in enumerate(deltas)}
    for p in range(P):
        s = src[owner == p]
        s_owner = s // nps
        view = rslot[p, :s.size]
        for r in range(P):
            if r == p:
                continue
            need = requests[p][r]
            if need.size == 0:
                continue
            em = s_owner == r
            d = (p - r) % P
            view[em] = (delta_off[d]
                        + np.searchsorted(need, s[em])).astype(np.int32)

    # --- compact remote (boundary) edge arrays --------------------------------
    r_counts = (m & ~lm).sum(axis=1)
    Er = max(_round_up(int(r_counts.max()), pad_multiple), pad_multiple)
    if capacities is not None:
        if Er > capacities.remote_edges:
            raise ValueError(f"boundary edge count {int(r_counts.max())} "
                             f"exceeds capacity {capacities.remote_edges}")
        Er = capacities.remote_edges
    remote_dst = np.zeros((P, Er), np.int32)
    remote_src_g = np.zeros((P, Er), np.int32)
    remote_slot_c = np.zeros((P, Er), np.int32)
    remote_mask_c = np.zeros((P, Er), bool)
    for p in range(P):
        sel = m[p] & ~lm[p]
        kk = int(sel.sum())
        remote_dst[p, :kk] = dst_l[p][sel]
        remote_src_g[p, :kk] = src_g[p][sel]
        remote_slot_c[p, :kk] = rslot[p][sel]
        remote_mask_c[p, :kk] = True

    # --- per-shard tile-pair plans for the block-sparse Pallas SpMM ----------
    from mrp_gnn_tpu.graph import build_bsp_pairs, derive_bsp_pairs_t
    bsp_tile = next((t for t in (128, 64, 32, 16, 8) if nps % t == 0), 0)
    bsp = {"bsp_pair_dst": None, "bsp_pair_src": None,
           "bsp_pair_first": None, "bsp_pair_last": None,
           "bsp_pair_dst_t": None, "bsp_pair_src_t": None,
           "bsp_pair_first_t": None, "bsp_pair_last_t": None}
    if bsp_tile:
        per = [tuple(np.asarray(a) for a in
                     build_bsp_pairs(ell_src[p], ell_mask[p], bsp_tile))
               for p in range(P)]
        pmax = max(x[0].size for x in per)
        if capacities is not None and capacities.bsp_pairs:
            if pmax > capacities.bsp_pairs:
                raise ValueError(f"{pmax} tile pairs exceed capacity "
                                 f"{capacities.bsp_pairs}")
            pmax = capacities.bsp_pairs
        # Inert tail pairs MUST target the LAST dst tile (nt-1), matching
        # build_bsp_pairs' protocol: emission fires only on last=1, so inert
        # steps may only revisit the already-emitted FINAL tile's output
        # block. Zero-filled tails would re-map the Pallas output window to
        # tile 0 after its emission and the end-of-grid copy-out would
        # overwrite tile 0 with stale VMEM contents on TPU.
        nt = nps // bsp_tile
        # Src-major re-sort per shard for the Pallas backward kernels; its
        # width is ALWAYS pmax + nt (real pairs + at most one diagonal
        # fallback per source-less tile) so capacity-pinned dynamic streams
        # keep batch-invariant shapes.
        per_t = [derive_bsp_pairs_t(per[p][0], per[p][1], per[p][3], nt,
                                    max_pairs=pmax + nt)
                 for p in range(P)]
        fills = (nt - 1, nt - 1, 0, 0)  # pair_dst, pair_src, first, last
        stacked, stacked_t = [], []
        for i, fill in enumerate(fills):
            arr = np.full((P, pmax), fill, np.int32)
            for p in range(P):
                arr[p, :per[p][i].size] = per[p][i]
            stacked.append(arr)
            stacked_t.append(np.stack([per_t[p][i] for p in range(P)]))
        bsp = dict(zip(bsp.keys(), stacked + stacked_t))

    out = dict(
        src_global=src_g,
        dst_local=dst_l,
        mask=m,
        local_mask=lm,
        send_idx=send_idx,
        remote_dst=remote_dst,
        remote_src_global=remote_src_g,
        remote_slot=remote_slot_c,
        remote_mask=remote_mask_c,
        ell_src=ell_src,
        ell_mask=ell_mask,
        deltas=tuple(deltas),
        delta_rows=tuple(delta_rows),
        bsp_tile=bsp_tile,
        **bsp,
    )
    _remote_ell_arrays(out, nps, capacities, pad_multiple)
    _expanded_plan_arrays(out, capacities)
    return out


def partition_batch(graph: GraphBatch, num_replicas: int, num_shards: int,
                    capacities: PlanCapacities,
                    pad_multiple: int = 8) -> EdgePartitionPlan:
    """Per-batch partition plan for a DYNAMIC-topology batch, stacked over
    data replicas: plan arrays are [num_replicas * num_shards, ...] so a
    shard_map over the ("data", "graph") mesh gives each device the plan of
    exactly its (replica, shard) block.

    The batch's scenes must divide contiguously over replicas (the builtin
    pipeline's layout), so every edge stays inside its replica's node block.
    Capacities come from the full-connectivity replica graph — a
    componentwise upper bound for any radius topology on the same layout —
    so every batch's plan shares one set of shapes and ring structure.
    """
    V = graph.max_nodes
    if V % num_replicas:
        raise ValueError(f"max_nodes={V} not divisible by "
                         f"num_replicas={num_replicas}")
    v_rep = V // num_replicas
    if v_rep % num_shards:
        raise ValueError(f"replica nodes {v_rep} not divisible by "
                         f"num_shards={num_shards}")
    nps = v_rep // num_shards

    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    mask = np.asarray(graph.edge_mask)
    src, dst = src[mask], dst[mask]
    rep = dst // v_rep
    if src.size and not np.array_equal(rep, src // v_rep):
        raise ValueError("an edge crosses data-replica node blocks — scenes "
                         "must divide contiguously over replicas")

    from mrp_gnn_tpu.data import graph_native
    per = []
    for r in range(num_replicas):
        sel = rep == r
        rs, rd = src[sel] - r * v_rep, dst[sel] - r * v_rep
        # Per-batch dynamic plans sit on the input-pipeline critical path at
        # swarm scale; the native C++ builder (graphbuild.cc
        # mrp_build_partition_plan) produces bit-identical arrays
        # (tests/test_graph_native.py) ~10x faster than the numpy loops.
        arrs = graph_native.partition_plan_arrays_native(
            rs, rd, nps, num_shards, capacities)
        if arrs is None:
            arrs = _plan_arrays(rs, rd, nps, num_shards, pad_multiple,
                                capacities)
        else:
            _remote_ell_arrays(arrs, nps, capacities, pad_multiple)
            _expanded_plan_arrays(arrs, capacities)
        per.append(arrs)
    stacked = {}
    for k, v0 in per[0].items():
        if k in ("deltas", "delta_rows", "bsp_tile", "xp_rows", "xp_width"):
            stacked[k] = v0  # uniform under shared capacities
        elif v0 is None:
            stacked[k] = None
        else:
            stacked[k] = np.concatenate([p[k] for p in per], axis=0)
    # numpy leaves: per-batch plans are built on the input-pipeline thread;
    # the host->device copy belongs to jit dispatch.
    return _wrap_plan(stacked, num_shards, nps, to_jnp=False)


def boundary_fraction(plan: EdgePartitionPlan) -> float:
    """Fraction of valid edges whose source is off-shard (diagnostic)."""
    valid = np.asarray(plan.mask)
    local = np.asarray(plan.local_mask)
    n = valid.sum()
    return float((valid & ~local).sum() / max(n, 1))


def exchange_rows(plan: EdgePartitionPlan) -> dict:
    """Per-shard ICI traffic (rows received over the wire) for the exchange
    modes — the byte-count diagnostic for the contract's
    boundary-proportional claim (BASELINE.json:5).

    "boundary": per-delta ppermute receive = sum_d B_d rows per shard;
    "useful" counts only genuinely-requested rows (excludes padding).
    "all_gather": the legacy full-value gather = (P-1)*nodes_per_shard rows.
    """
    P, nps = plan.num_shards, plan.nodes_per_shard
    src = np.asarray(plan.src_global)
    m = np.asarray(plan.mask)
    lm = np.asarray(plan.local_mask)
    # real requested rows per shard = unique off-shard sources of its edges
    # (global ids are already distinct across owner shards)
    useful = sum(int(np.unique(src[p][m[p] & ~lm[p]]).size) for p in range(P))
    return {
        "boundary": plan.recv_rows,
        "all_gather": (P - 1) * nps,
        "useful_total": useful,
        "padded_total": P * plan.recv_rows,
    }
