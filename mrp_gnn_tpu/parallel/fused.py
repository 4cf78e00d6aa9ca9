"""Partitioned graph fusion: shard_map edge block with overlapped boundary exchange.

Drop-in replacement for models.fusion.default_edge_fusion (same signature)
that executes the SDDMM -> segment-softmax -> SpMM block over an edge-
partitioned graph on a ("data", "graph") mesh (BASELINE.json:5):

- node arrays are block-sharded over both mesh axes (data-parallel batches,
  graph-partitioned nodes within each);
- each graph shard owns the edges whose destination it hosts (see
  parallel/partition.py), so softmax and scatter-add stay local;
- source values for boundary edges arrive via an all_gather over the
  "graph" axis — issued BEFORE the local-edge partial aggregation so XLA's
  latency-hiding scheduler overlaps the ICI transfer with the local SpMM
  (the graph-world halo exchange; SURVEY.md section 2.3);
- the tiny key vectors are gathered separately up front: attention logits
  need every source's key, but keys are [V, d_att] — orders of magnitude
  smaller than value feature maps.

Gradients flow through shard_map; the all_gather transposes to a
reduce-scatter automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mrp_gnn_tpu.graph import GraphBatch
from mrp_gnn_tpu.parallel.partition import EdgePartitionPlan


def make_partitioned_edge_fusion(mesh: Mesh, plan: EdgePartitionPlan) -> Callable:
    """Build an edge_fusion_fn closed over the mesh and partition plan.

    Node arrays must be sharded over P(("data", "graph")) on the node axis;
    the plan describes the per-data-replica graph (topology is identical
    across data shards).
    """
    nps = plan.nodes_per_shard

    def edge_fn(ops, aggregation: str, q, k, flat_values, graph: GraphBatch):
        del graph  # topology comes pre-partitioned via the plan

        def shard_fn(q_loc, k_loc, v_loc, src_g, dst_l, emask, lmask):
            # Leading plan axis is the shard dim mapped by shard_map -> [1, E].
            src_g, dst_l = src_g[0], dst_l[0]
            emask, lmask = emask[0], lmask[0]
            shard = jax.lax.axis_index("graph")

            # --- boundary exchange ------------------------------------------
            # Values: issued first so the ICI transfer overlaps the local
            # aggregation below (no data dependence until agg_remote).
            v_all = jax.lax.all_gather(v_loc, "graph", tiled=True)   # [V_rep, D]

            if aggregation == "attention":
                k_all = jax.lax.all_gather(k_loc, "graph", tiled=True)
                # SDDMM with local queries and gathered keys.
                logits = jnp.einsum("ed,ed->e", q_loc[dst_l], k_all[src_g])
                logits = logits / np.sqrt(q_loc.shape[-1])
                alpha = ops.segment_softmax(logits, dst_l, nps, emask)
            elif aggregation == "mean":
                deg = jax.ops.segment_sum(emask.astype(v_loc.dtype), dst_l,
                                          num_segments=nps)
                alpha = (1.0 / jnp.maximum(deg, 1.0))[dst_l]
            else:
                raise ValueError(f"unknown aggregation {aggregation!r}")

            # --- local partial: sources resident on this shard --------------
            src_local = jnp.clip(src_g - shard * nps, 0, nps - 1)
            agg_local = ops.spmm(alpha, v_loc, src_local, dst_l, nps, lmask)

            # --- remote partial: boundary sources from the gathered buffer --
            rmask = emask & ~lmask
            agg_remote = ops.spmm(alpha, v_all, src_g, dst_l, nps, rmask)
            return agg_local + agg_remote

        sharded = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(("data", "graph")),  # q (or placeholder)
                P(("data", "graph")),  # k (or placeholder)
                P(("data", "graph")),  # flat values
                P("graph"), P("graph"), P("graph"), P("graph"),  # plan
            ),
            out_specs=P(("data", "graph")),
            check_vma=False,
        )
        if q is None:  # mean aggregation carries no attention vectors
            q = jnp.zeros((flat_values.shape[0], 1), flat_values.dtype)
            k = q
        return sharded(q, k, flat_values, plan.src_global, plan.dst_local,
                       plan.mask, plan.local_mask)

    return edge_fn
