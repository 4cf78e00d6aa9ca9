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
from mrp_gnn_tpu.parallel.partition import EdgePartitionPlan


def make_partitioned_edge_fusion(mesh: Mesh, plan: EdgePartitionPlan,
                                 exchange: str = "boundary",
                                 overlap: bool = True) -> Callable:
    """Build an edge_fusion_fn closed over the mesh and partition plan.

    Node arrays must be sharded over P(("data", "graph")) on the node axis;
    the plan describes the per-data-replica graph (topology is identical
    across data shards).

    exchange: "boundary" (per-delta ppermute halo rings of requested rows) or
      "all_gather" (legacy full-value gather; O(V*D) traffic).
    overlap: issue the value exchange before the local partial aggregation
      (True) or serialize it after (False) — the A/B for
      ParallelConfig.overlap_boundary_exchange.
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
        del graph  # topology comes pre-partitioned via the plan

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

        def shard_fn(q_loc, k_loc, v_loc, src_g, dst_l, emask, lmask,
                     sidx, rslot):
            # Leading plan axis is the shard dim mapped by shard_map -> [1, .].
            src_g, dst_l = src_g[0], dst_l[0]
            emask, lmask = emask[0], lmask[0]
            sidx, rslot = sidx[0], rslot[0]          # [sum B_d], [E]
            shard = jax.lax.axis_index("graph")
            src_local = jnp.clip(src_g - shard * nps, 0, nps - 1)
            rmask = emask & ~lmask

            # --- attention weights (keys are tiny: [V, d_att] << values) ----
            if aggregation == "attention":
                if exchange == "boundary":
                    k_remote = halo(k_loc, sidx)
                    k_edge = jnp.where(lmask[:, None], k_loc[src_local],
                                       k_remote[rslot])
                else:
                    k_all = jax.lax.all_gather(k_loc, "graph", tiled=True)
                    k_edge = k_all[src_g]
                logits = jnp.einsum("ed,ed->e", q_loc[dst_l], k_edge)
                logits = logits / np.sqrt(q_loc.shape[-1])
                alpha = ops.segment_softmax(logits, dst_l, nps, emask)
            elif aggregation == "mean":
                deg = jax.ops.segment_sum(emask.astype(v_loc.dtype), dst_l,
                                          num_segments=nps)
                alpha = (1.0 / jnp.maximum(deg, 1.0))[dst_l]
            else:
                raise ValueError(f"unknown aggregation {aggregation!r}")

            # --- value exchange + two-partial aggregation -------------------
            # overlap=True: the collective is issued first with no data
            # dependence on the local partial, so XLA overlaps it with the
            # local SpMM. overlap=False: optimization_barrier forces the
            # local values (and thus the send gather + collective) to wait
            # for agg_local — the serialized control.
            if exchange == "boundary":
                if overlap:
                    v_remote = halo(v_loc, sidx)
                    agg_local = ops.spmm(alpha, v_loc, src_local, dst_l, nps,
                                         lmask)
                else:
                    agg_local = ops.spmm(alpha, v_loc, src_local, dst_l, nps,
                                         lmask)
                    v_gate, agg_local = jax.lax.optimization_barrier(
                        (v_loc, agg_local))
                    v_remote = halo(v_gate, sidx)
                agg_remote = ops.spmm(alpha, v_remote, rslot, dst_l, nps,
                                      rmask)
            else:
                v_all = jax.lax.all_gather(v_loc, "graph", tiled=True)
                agg_local = ops.spmm(alpha, v_loc, src_local, dst_l, nps,
                                     lmask)
                agg_remote = ops.spmm(alpha, v_all, src_g, dst_l, nps, rmask)
            return agg_local + agg_remote

        sharded = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(("data", "graph")),  # q (or placeholder)
                P(("data", "graph")),  # k (or placeholder)
                P(("data", "graph")),  # flat values
                P("graph"), P("graph"), P("graph"), P("graph"),  # edge plan
                P("graph"), P("graph"),                          # exchange plan
            ),
            out_specs=P(("data", "graph")),
        )
        if q is None:  # mean aggregation carries no attention vectors
            q = jnp.zeros((flat_values.shape[0], 1), flat_values.dtype)
            k = q
        return sharded(q, k, flat_values, plan.src_global, plan.dst_local,
                       plan.mask, plan.local_mask, plan.send_idx,
                       plan.remote_slot)

    return edge_fn
