"""Robot-graph message-passing fusion layer.

The reference fuses robot feature maps with dense per-pair attention over an
N x N adjacency (SURVEY.md section 3.3, reconstructed — reference mount
empty). Here the same math runs sparse over the batched padded edge list:

    SDDMM  : per-edge attention logits from (dst query, src key) vectors
    segment_softmax : normalize over each destination's in-edges
    SpMM   : attention-weighted scatter-add of source value feature maps
    update : 1x1-conv fuse of ego features with the aggregated message

so one jitted program covers any number of scenes/robots, and the edge ops
swap between the XLA reference path and Pallas TPU kernels
(mrp_gnn_tpu.ops.dispatch).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrp_gnn_tpu.graph import GraphBatch
from mrp_gnn_tpu.ops import dispatch


def default_edge_fusion(ops, aggregation: str, q, k, flat_values,
                        graph: GraphBatch) -> jnp.ndarray:
    """Single-device edge block: SDDMM -> segment-softmax -> SpMM.

    The partitioned path (mrp_gnn_tpu.parallel.fused) provides a shard_map'd
    drop-in replacement with the same signature.
    """
    V = flat_values.shape[0]
    block = graph.scene_stride > 0
    ell = graph.ell_src is not None
    if aggregation == "attention":
        # Fastest applicable path: dense block-diagonal (MXU) > ELL gather
        # (regular, scatter-free) > edge-list (general fallback).
        if block and ops.block_fused_attention is not None:
            return ops.block_fused_attention(q, k, flat_values, graph)
        if ell and ops.ell_attention is not None:
            return ops.ell_attention(q, k, flat_values, graph)
        logits = ops.sddmm(q, k, graph.edge_src, graph.edge_dst, graph.edge_mask)
        logits = logits / np.sqrt(q.shape[-1])
        alpha = ops.segment_softmax(logits, graph.edge_dst, V, graph.edge_mask)
        return ops.spmm(alpha, flat_values, graph.edge_src, graph.edge_dst, V,
                        graph.edge_mask)
    if aggregation == "mean":
        if block and ops.block_mean_agg is not None:
            return ops.block_mean_agg(flat_values, graph)
        if ell and ops.ell_mean is not None:
            return ops.ell_mean(flat_values, graph)
        return ops.segment_mean_agg(flat_values, graph.edge_src, graph.edge_dst,
                                    V, graph.edge_mask)
    if aggregation == "max":
        if block and ops.block_max_agg is not None:
            return ops.block_max_agg(flat_values, graph)
        if ell and ops.ell_max is not None:
            return ops.ell_max(flat_values, graph)
        return ops.segment_max_agg(flat_values, graph.edge_src, graph.edge_dst,
                                   V, graph.edge_mask)
    raise ValueError(f"unknown aggregation {aggregation!r}")


class GraphFusionLayer(nn.Module):
    """One round of cross-robot message passing on bottleneck feature maps.

    aggregation: "mean" (config two_robot_mean), "attention"
    (five_robot_attention and up), or "max" (element-wise max pooling over
    in-neighbours — the segment tier's third reduction).
    """

    aggregation: str = "attention"
    attention_dim: int = 64
    attention_heads: int = 1
    norm_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    ops_impl: str = "xla"
    # Optional override of the whole edge block, signature
    # (ops, aggregation, q, k, flat_values, graph) -> msg [V, D]; the
    # partitioned path (mrp_gnn_tpu.parallel) injects its shard_map'd version.
    edge_fusion_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, graph: GraphBatch) -> jnp.ndarray:
        """feats: [V, h, w, C] bottleneck maps -> fused [V, h, w, C]."""
        V, h, w, C = feats.shape
        ops = dispatch.get_ops(self.ops_impl)
        edge_fn = self.edge_fusion_fn or default_edge_fusion

        # Values: 1x1-conv transform of the source feature map.
        values = nn.Conv(C, (1, 1), dtype=self.dtype, name="value")(feats)
        heads = self.attention_heads if self.aggregation == "attention" else 1
        if heads > 1 and C % heads:
            raise ValueError(f"channels {C} not divisible by "
                             f"attention_heads={heads}")
        # heads > 1 composes with every edge_fn, including the partitioned
        # shard_map path: vmap batches the shard_map body per head.

        if self.aggregation == "attention":
            # Edge scores from globally-pooled descriptors: cheap relative to
            # the value SpMM, and matches the reference's per-pair scalar
            # attention over pooled features (SURVEY.md 3.3). With heads > 1,
            # each head scores its own channel group independently.
            pooled = feats.mean(axis=(1, 2))  # [V, C]
            q = nn.Dense(heads * self.attention_dim, dtype=self.dtype,
                         name="query")(pooled)
            k = nn.Dense(heads * self.attention_dim, dtype=self.dtype,
                         name="key")(pooled)
        else:
            q = k = None

        with jax.named_scope(f"graph_fusion_{self.aggregation}"):
            if heads > 1:
                # [V, h*w, heads, C/heads] -> per-head flat feature vectors.
                # Loop the edge block over heads (heads is small and static)
                # instead of vmap: vmap's auto-batching of pallas_call
                # produces Mosaic-unlowerable block shapes on TPU (squeezed
                # batch dims break the (8, 128) minor-tile rule), while a
                # loop keeps each head a plain kernel / shard_map call —
                # identical math either way.
                vh = values.reshape(V, h * w, heads, C // heads)
                vh = vh.transpose(0, 2, 1, 3).reshape(
                    V, heads, h * w * (C // heads))
                qh = q.reshape(V, heads, self.attention_dim)
                kh = k.reshape(V, heads, self.attention_dim)
                msg = jnp.stack(
                    [edge_fn(ops, "attention", qh[:, i], kh[:, i], vh[:, i],
                             graph) for i in range(heads)], axis=1)
                msg = msg.reshape(V, heads, h * w, C // heads)
                msg = msg.transpose(0, 2, 1, 3).reshape(V, h, w, C)
            else:
                flat_values = values.reshape(V, h * w * C)
                msg = edge_fn(ops, self.aggregation, q, k, flat_values, graph)
                msg = msg.reshape(V, h, w, C)
        # Fuse ego features with the aggregated neighbourhood message.
        fused = jnp.concatenate([feats, msg], axis=-1)
        fused = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                        name="update")(fused)
        fused = nn.GroupNorm(num_groups=min(self.norm_groups, C),
                             dtype=self.dtype, name="update_norm")(fused)
        out = feats + nn.relu(fused)
        # Zero padded node slots so downstream stats/decoders never see them.
        return out * graph.node_mask[:, None, None, None].astype(out.dtype)
