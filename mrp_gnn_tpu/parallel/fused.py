"""Partitioned graph fusion: shard_map edge block with overlapped boundary exchange.

Drop-in replacement for models.fusion.default_edge_fusion (same signature)
that executes the SDDMM -> segment-softmax -> SpMM block over an edge-
partitioned graph on a ("data", "graph") mesh (BASELINE.json:5):

- node arrays are block-sharded over both mesh axes (data-parallel batches,
  graph-partitioned nodes within each);
- each graph shard owns the edges whose destination it hosts (see
  parallel/partition.py), so softmax and scatter-add stay local;
- source values for boundary edges arrive via BOUNDARY-ONLY halo exchange:
  one ppermute ring per active shard offset (EdgePartitionPlan.deltas),
  each shipping exactly the rows its peer's boundary edges reference
  (send_idx). Per-shard ICI traffic is O(boundary rows * D) — proportional
  to the real boundary set, not O(V * D) — the contract's "boundary robot
  features exchanged over ICI" (BASELINE.json:5). The legacy full
  all_gather is kept behind exchange="all_gather" for A/B benchmarking.
- ordering for overlap: the tiny key exchange completes first (attention
  logits need boundary keys before the softmax), then the BIG value
  exchange is issued BEFORE the local-edge partial aggregation, which has
  no data dependence on it — XLA's latency-hiding scheduler overlaps the
  ICI transfer with the local SDDMM/softmax/SpMM (the graph-world halo
  exchange; SURVEY.md section 2.3). overlap=False serializes the value
  collective after the local partial via optimization_barrier, giving a
  measurable A/B for ParallelConfig.overlap_boundary_exchange.

Gradients flow through shard_map; ppermute transposes to the inverse
permutation, the send-gather to a scatter-add.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mrp_gnn_tpu.graph import GraphBatch
from mrp_gnn_tpu.ops import reference as R
from mrp_gnn_tpu.ops.reference import _NEG
from mrp_gnn_tpu.parallel.partition import EdgePartitionPlan


def make_partitioned_edge_fusion(mesh: Mesh, plan: EdgePartitionPlan,
                                 exchange: str = "boundary",
                                 overlap: bool = True,
                                 dynamic: bool = False) -> Callable:
    """Build an edge_fusion_fn closed over the mesh and partition plan.

    Node arrays must be sharded over P(("data", "graph")) on the node axis;
    the plan describes the per-data-replica graph (topology is identical
    across data shards).

    exchange: "boundary" (per-delta ppermute halo rings of requested rows) or
      "all_gather" (legacy full-value gather; O(V*D) traffic).
    overlap: issue the value exchange before the local partial aggregation
      (True) or serialize it after (False) — the A/B for
      ParallelConfig.overlap_boundary_exchange.
    dynamic: per-batch topology (DataConfig.mobility > 0). ``plan`` then
      serves only as the CAPACITY plan fixing shapes and ring structure;
      the actual plan arrives per call on graph.partition_plan, stacked
      over data replicas ([R*P, ...], partition.partition_batch) and
      sharded over both mesh axes.
    """
    if exchange not in ("boundary", "all_gather"):
        raise ValueError(f"unknown exchange mode {exchange!r}")
    nps = plan.nodes_per_shard
    nshards = plan.num_shards
    deltas, delta_rows = plan.deltas, plan.delta_rows
    offs = np.concatenate([[0], np.cumsum(delta_rows)]).astype(int)
    perms = [tuple((s, (s + d) % nshards) for s in range(nshards))
             for d in deltas]

    def edge_fn(ops, aggregation: str, q, k, flat_values, graph: GraphBatch):
        if dynamic:
            if graph.partition_plan is None:
                raise ValueError("dynamic partitioned fusion needs the "
                                 "per-batch plan on graph.partition_plan "
                                 "(ParallelContext.attach_plan)")
            live = graph.partition_plan
            if (live.deltas != deltas or live.delta_rows != delta_rows
                    or live.nodes_per_shard != nps):
                raise ValueError("per-batch plan structure differs from the "
                                 "capacity plan — build it with the same "
                                 "PlanCapacities")
            # A live plan WITHOUT expanded arrays is legal: the capacity
            # set had no xp_pairs opt-in, so the local path takes the ELL
            # gather fallback (a static capacity plan may still carry its
            # own auto-built xp arrays — that asymmetry is the documented
            # default, not an error). Only a PRESENT-but-mismatched
            # expanded structure is a build error.
            if (live.xp_pair_dst is not None
                    and (live.xp_rows, live.xp_width) != (plan.xp_rows,
                                                          plan.xp_width)):
                raise ValueError("per-batch expanded-plan structure differs "
                                 "from the capacity plan — build it with "
                                 "the same PlanCapacities (xp_pairs)")
        else:
            live = plan  # topology is static; the plan is compiled in

        def halo(x_loc, sidx):
            """Per-delta ppermute of the requested rows; receive buffer is
            the concat over deltas (matches plan.remote_slot)."""
            parts = []
            for i, (d, bd) in enumerate(zip(deltas, delta_rows)):
                send = x_loc[sidx[offs[i]:offs[i] + bd]]
                parts.append(jax.lax.ppermute(send, "graph", perms[i]))
            if not parts:  # no boundary edges anywhere: 1-row dummy buffer
                return jnp.zeros((1, x_loc.shape[-1]), x_loc.dtype)
            return jnp.concatenate(parts, axis=0)

        def shard_fn(q_loc, k_loc, v_loc, sidx, re_slot, re_srcg, re_mask,
                     ell_s, ell_m, *bsp):
            # Leading plan axis is the shard dim mapped by shard_map -> [1, .].
            sidx = sidx[0]                                        # [sum B_d]
            re_slot, re_srcg = re_slot[0], re_srcg[0]             # [nps, Lr]
            re_m = re_mask[0]                                     # [nps, Lr]
            ell_s, ell_m = ell_s[0], ell_m[0]                     # [nps, L]
            bsp = tuple(b[0] for b in bsp)                        # pairs x8

            def r_gather(x_remote, x_all):
                """Boundary-edge source rows in ELL form [nps, Lr, D] —
                regular gathers, NO scatter anywhere on the remote path."""
                return (x_remote[re_slot] if x_all is None
                        else x_all[re_srcg])

            if aggregation == "max":
                # max decomposes exactly over the local/remote split:
                # out = max(local max, remote max), empty sides excluded.
                def local_max():
                    m_l = R.ell_aggregate(None, v_loc, ell_s, ell_m, "max")
                    return jnp.where(ell_m.any(-1)[:, None], m_l, _NEG)

                if exchange == "boundary":
                    if overlap:
                        v_remote = halo(v_loc, sidx)
                        cand_l = local_max()
                    else:
                        cand_l = local_max()
                        v_gate, cand_l = jax.lax.optimization_barrier(
                            (v_loc, cand_l))
                        v_remote = halo(v_gate, sidx)
                    v_edge = r_gather(v_remote, None)
                else:
                    v_all = jax.lax.all_gather(v_loc, "graph", tiled=True)
                    cand_l = local_max()
                    v_edge = r_gather(None, v_all)
                cand = jnp.where(re_m[..., None], v_edge,
                                 jnp.asarray(_NEG, v_edge.dtype))
                m_r = cand.max(axis=1)                          # [nps, D]
                out = jnp.maximum(cand_l.astype(jnp.float32),
                                  m_r.astype(jnp.float32))
                has = ell_m.any(-1) | re_m.any(-1)
                return jnp.where(has[:, None], out, 0.0).astype(v_loc.dtype)

            # Local edges ride the per-shard ELL layout (regular gathers /
            # Pallas tile kernels — the bulk of a radius swarm); boundary
            # edges ride their OWN ELL view over the receive buffer, so the
            # whole remote path is gathers + row reductions (round 3 — the
            # old compact-edge-list scatter-add path is gone).
            # Attention weights come from ONE softmax split across both sets
            # (shared per-row max and normalizer), so the result is exactly
            # the unpartitioned segment softmax.
            if aggregation == "attention":
                inv_sqrt = 1.0 / np.sqrt(q_loc.shape[-1])
                if mode == "xp":
                    # >128-degree local logits over the per-shard row-
                    # expanded plan: streams k as whole tiles instead of
                    # the [nps, L, dk] gather (docs/kernels.md degree cap)
                    from mrp_gnn_tpu.ops.pallas_bsp import xp_sddmm
                    lg_l = xp_sddmm(q_loc, k_loc, ell_s, bsp, plan.xp_rows,
                                    plan.xp_width,
                                    plan.bsp_tile) * inv_sqrt
                else:
                    lg_l = R.ell_sddmm(q_loc, k_loc, ell_s, ell_m) * inv_sqrt
                lg_l = jnp.where(ell_m, lg_l, _NEG)             # [nps, L]
                if exchange == "boundary":
                    k_remote = halo(k_loc, sidx)
                    k_edge = r_gather(k_remote, None)           # [nps, Lr, dk]
                else:
                    k_all = jax.lax.all_gather(k_loc, "graph", tiled=True)
                    k_edge = r_gather(None, k_all)
                lg_r = jnp.einsum("vd,vjd->vj", q_loc, k_edge) * inv_sqrt
                lg_r = jnp.where(re_m, lg_r, _NEG)              # [nps, Lr]

                m_l = jnp.max(lg_l, axis=-1)                    # [nps]
                m_r = jnp.max(lg_r, axis=-1)
                mx = jnp.maximum(jnp.maximum(m_l, m_r), _NEG / 2)
                mx = jax.lax.stop_gradient(mx)[:, None]
                e_l = jnp.where(ell_m, jnp.exp(lg_l - mx), 0.0)
                e_r = jnp.where(re_m, jnp.exp(lg_r - mx), 0.0)
                denom = e_l.sum(-1) + e_r.sum(-1)
                denom = jnp.where(denom > 0, denom, 1.0)
                alpha_l = e_l / denom[:, None]                  # [nps, L]
                alpha_r = e_r / denom[:, None]                  # [nps, Lr]
            elif aggregation == "mean":
                deg = (ell_m.sum(-1) + re_m.sum(-1)).astype(v_loc.dtype)
                inv = 1.0 / jnp.maximum(deg, 1.0)
                alpha_l = jnp.broadcast_to(inv[:, None], ell_m.shape) * ell_m
                alpha_r = jnp.broadcast_to(inv[:, None], re_m.shape) * re_m
            else:
                raise ValueError(f"unknown aggregation {aggregation!r}")

            def agg_local_fn(v):
                w = alpha_l.astype(jnp.float32)
                if mode == "square":
                    # Pallas backend: the shard-local aggregate (the bulk of
                    # the bytes) rides the tile-block-sparse SpMM kernel —
                    # whole-tile sequential DMAs + one-hot MXU selection
                    # (ops/pallas_bsp.py), same plan protocol, per shard.
                    from mrp_gnn_tpu.ops.pallas_bsp import (_bsp_spmm,
                                                            _interpret)
                    # softmax/mean weights are exactly 0 on masked slots
                    return _bsp_spmm(w * ell_m, v, ell_s, *bsp,
                                     plan.bsp_tile, _interpret())
                if mode == "xp":
                    # >128-degree: expanded SpMM over the per-shard
                    # rectangular plan + reshape-sum of the row partials —
                    # composes the two round-4 wins (expanded kernels x
                    # edge partitioning); the gather league OOMs here.
                    from mrp_gnn_tpu.ops.pallas_bsp import (
                        xp_weighted_aggregate)
                    return xp_weighted_aggregate(w * ell_m, v, ell_s, bsp,
                                                 plan.xp_rows, plan.xp_width,
                                                 plan.bsp_tile)
                return R.ell_aggregate(w, v, ell_s, ell_m, "sum")

            def agg_remote_fn(v_remote, v_all):
                v_edge = r_gather(v_remote, v_all)              # [nps, Lr, D]
                return jnp.einsum("vj,vjd->vd",
                                  (alpha_r * re_m).astype(jnp.float32),
                                  v_edge.astype(jnp.float32)
                                  ).astype(v_loc.dtype)

            # --- value exchange + two-partial aggregation -------------------
            # overlap=True: the collective is issued first with no data
            # dependence on the local partial, so XLA overlaps it with the
            # local aggregate. overlap=False: optimization_barrier forces the
            # local values (and thus the send gather + collective) to wait
            # for agg_local — the serialized control.
            if exchange == "boundary":
                if overlap:
                    v_remote = halo(v_loc, sidx)
                    agg_local = agg_local_fn(v_loc)
                else:
                    agg_local = agg_local_fn(v_loc)
                    v_gate, agg_local = jax.lax.optimization_barrier(
                        (v_loc, agg_local))
                    v_remote = halo(v_gate, sidx)
                agg_remote = agg_remote_fn(v_remote, None)
            else:
                v_all = jax.lax.all_gather(v_loc, "graph", tiled=True)
                agg_local = agg_local_fn(v_loc)
                agg_remote = agg_remote_fn(None, v_all)
            return agg_local + agg_remote

        # Pallas backend + a tile plan: ship the per-shard pair arrays so
        # the local aggregate runs on the block-sparse kernels — the SQUARE
        # plan up to the 128-column cap (see B.supports), the per-shard
        # ROW-EXPANDED rectangular plan past it (round 5: high degree
        # composes with partitioning instead of dropping to the gather
        # league). Compiled backends only: pallas interpret mode cannot mix
        # shard-varying scalar-prefetch (the per-shard pair plan) with grid
        # indices under check_vma, so the CPU simulation falls back to the
        # ELL gather path (same math, XLA ops).
        from mrp_gnn_tpu.ops.pallas_bsp import _interpret
        is_pallas = (getattr(ops, "impl", "xla") == "pallas"
                     and plan.bsp_tile > 0 and not _interpret())
        if (is_pallas and live.bsp_pair_dst is not None
                and int(plan.ell_mask.shape[-1]) <= 128):
            mode = "square"
            bsp_args = (live.bsp_pair_dst, live.bsp_pair_src,
                        live.bsp_pair_first, live.bsp_pair_last,
                        live.bsp_pair_dst_t, live.bsp_pair_src_t,
                        live.bsp_pair_first_t, live.bsp_pair_last_t)
        elif is_pallas and live.xp_pair_dst is not None:
            # (plan.xp_* meta is consistent here by the structure check
            # above: a live plan carrying xp arrays implies matching
            # capacity-plan rows/width.)
            mode = "xp"
            bsp_args = (live.xp_pair_dst, live.xp_pair_src,
                        live.xp_pair_first, live.xp_pair_last,
                        live.xp_pair_dst_t, live.xp_pair_src_t,
                        live.xp_pair_first_t, live.xp_pair_last_t)
        else:
            mode = "ell"
            bsp_args = ()
        # Static plans are [P, ...] (replicated over "data"); dynamic
        # per-batch plans are stacked per replica, [R*P, ...], so each
        # (replica, shard) device gets its own block.
        plan_spec = P(("data", "graph")) if dynamic else P("graph")
        sharded = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(("data", "graph")),  # q (or placeholder)
                P(("data", "graph")),  # k (or placeholder)
                P(("data", "graph")),  # flat values
                plan_spec,                                       # send plan
                plan_spec, plan_spec, plan_spec,                 # remote ELL
                plan_spec, plan_spec,                            # local ELL
            ) + (plan_spec,) * len(bsp_args),                    # BSP pairs
            out_specs=P(("data", "graph")),
        )
        if q is None:  # mean/max aggregation carries no attention vectors
            q = jnp.zeros((flat_values.shape[0], 1), flat_values.dtype)
            k = q
        return sharded(q, k, flat_values, live.send_idx,
                       live.remote_ell_slot, live.remote_ell_srcg,
                       live.remote_ell_mask, live.ell_src, live.ell_mask,
                       *bsp_args)

    return edge_fn
