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
  vector arrives via the gathered buffer (the boundary exchange), while
  local-source edges aggregate straight from the resident block — the two
  partial aggregates are summed, letting XLA overlap the collective with
  the local work.

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
         data_fields=["src_global", "dst_local", "mask", "local_mask"],
         meta_fields=["num_shards", "nodes_per_shard"])
@dataclasses.dataclass(frozen=True)
class EdgePartitionPlan:
    """Per-shard padded edge lists, stacked on a leading shard axis.

    src_global: int32 [P, E_s] global source node slot.
    dst_local:  int32 [P, E_s] destination slot local to the owning shard.
    mask:       bool  [P, E_s] slot validity.
    local_mask: bool  [P, E_s] valid AND source resident on this shard.
    """

    src_global: jax.Array
    dst_local: jax.Array
    mask: jax.Array
    local_mask: jax.Array
    num_shards: int
    nodes_per_shard: int

    @property
    def edges_per_shard(self) -> int:
        return self.mask.shape[1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def partition_graph(graph: GraphBatch, num_shards: int,
                    pad_multiple: int = 8) -> EdgePartitionPlan:
    """Build the static partition plan for a GraphBatch.

    Requires graph.max_nodes divisible by num_shards (pad the batch's
    max_nodes up when configuring — see DataConfig.max_nodes).
    """
    V = graph.max_nodes
    if V % num_shards:
        raise ValueError(f"max_nodes={V} not divisible by num_shards={num_shards}")
    nps = V // num_shards

    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    mask = np.asarray(graph.edge_mask)
    src, dst = src[mask], dst[mask]

    owner = dst // nps
    counts = np.bincount(owner, minlength=num_shards)
    E_s = max(_round_up(int(counts.max()) if counts.size else 1, pad_multiple),
              pad_multiple)

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

    return EdgePartitionPlan(
        src_global=jnp.asarray(src_g),
        dst_local=jnp.asarray(dst_l),
        mask=jnp.asarray(m),
        local_mask=jnp.asarray(lm),
        num_shards=P,
        nodes_per_shard=nps,
    )


def boundary_fraction(plan: EdgePartitionPlan) -> float:
    """Fraction of valid edges whose source is off-shard (diagnostic)."""
    valid = np.asarray(plan.mask)
    local = np.asarray(plan.local_mask)
    n = valid.sum()
    return float((valid & ~local).sum() / max(n, 1))
