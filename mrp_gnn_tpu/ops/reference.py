"""XLA reference implementations of the graph message-passing ops.

These are the correctness oracles for the Pallas kernels (SURVEY.md section
4.2) and the default backend on CPU. The reference repo computes the same
math densely over an N x N adjacency per scene (SURVEY.md section 3.3,
reconstructed — reference mount empty); here everything is edge-list sparse
with static padded shapes.

All ops are mask-aware: a padded edge (edge_mask False) or padded node never
influences any valid output, and gradients flow correctly through gather /
segment-sum (XLA's scatter-add transpose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Large-but-finite negative used to mask softmax logits. -inf would produce
# NaN (inf - inf) for destination nodes whose in-edges are all padding.
_NEG = -1e30


def sddmm(q: jax.Array, k: jax.Array, edge_src: jax.Array, edge_dst: jax.Array,
          edge_mask: jax.Array | None = None) -> jax.Array:
    """Per-edge scores: e = <q[dst_e], k[src_e]> (sampled dense-dense matmul).

    Args:
      q: [V, D] destination-side ("query") node vectors.
      k: [V, D] source-side ("key") node vectors.
      edge_src / edge_dst: int32 [E].
      edge_mask: optional bool [E]; masked edges score 0.

    Returns: float [E] edge scores.
    """
    scores = jnp.einsum("ed,ed->e", q[edge_dst], k[edge_src])
    if edge_mask is not None:
        scores = jnp.where(edge_mask, scores, 0.0)
    return scores


def segment_softmax(logits: jax.Array, segment_ids: jax.Array, num_segments: int,
                    mask: jax.Array | None = None) -> jax.Array:
    """Numerically-stable softmax of edge logits over each dst's in-edges.

    Masked (padding) edges get weight exactly 0; a segment whose edges are all
    masked yields all-zero weights (not NaN).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    # stop_gradient: the max subtraction is a constant shift per segment.
    shifted = logits - jax.lax.stop_gradient(seg_max)[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.where(denom > 0, denom, 1.0)
    return exp / denom[segment_ids]


def spmm(edge_weights: jax.Array, values: jax.Array, edge_src: jax.Array,
         edge_dst: jax.Array, num_nodes: int,
         edge_mask: jax.Array | None = None) -> jax.Array:
    """Attention-weighted sparse aggregation: out[v] = sum_e w_e * values[src_e].

    Args:
      edge_weights: float [E] per-edge scalar weights (e.g. attention).
      values: [V, D] node value vectors (feature maps flattened to D).
      edge_src / edge_dst: int32 [E].
      num_nodes: V (static).
      edge_mask: optional bool [E].

    Returns: [V, D] aggregated messages per destination node.
    """
    w = edge_weights
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0.0)
    msgs = values[edge_src] * w[:, None]
    return jax.ops.segment_sum(msgs, edge_dst, num_segments=num_nodes)


def block_fused_attention(q: jax.Array, k: jax.Array, values: jax.Array,
                          graph) -> jax.Array:
    """Fused attention message passing for BLOCK-DIAGONAL scene batches.

    With every scene sharing one topology at a fixed node stride
    (GraphBatch.scene_stride), the whole SDDMM -> softmax -> SpMM chain is
    batched dense masked attention over [S, n, .] blocks: pure MXU matmuls,
    each value row read exactly once — no gather/scatter at all. This is the
    XLA oracle for the Pallas kernel of the same name.

    q/k: [V, dk]; values: [V, D]. Returns [V, D].
    """
    n = graph.scene_stride
    S = graph.max_nodes // n
    dk = q.shape[-1]
    qb = q.reshape(S, n, dk)
    kb = k.reshape(S, n, dk)
    vb = values.reshape(S, n, -1)
    valid = graph.node_mask.reshape(S, n)

    logits = jnp.einsum("sid,sjd->sij", qb, kb) / np.sqrt(dk)
    # adj[dst, src] == 1 AND source node valid; invalid/absent -> -inf-like.
    bias = jnp.where((graph.scene_adj[None] > 0) & valid[:, None, :], 0.0, _NEG)
    logits = logits + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(jnp.maximum(m, _NEG / 2)))
    denom = e.sum(-1, keepdims=True)
    alpha = e / jnp.maximum(denom, 1e-30)
    # zero out rows whose in-edges are all masked (denom underflow guard)
    alpha = jnp.where(denom > 1e-20, alpha, 0.0)
    out = jnp.einsum("sij,sjd->sid", alpha, vb)
    return out.reshape(graph.max_nodes, -1)


def block_mean_agg(values: jax.Array, graph) -> jax.Array:
    """Mean aggregation for block-diagonal scene batches (dense path)."""
    n = graph.scene_stride
    S = graph.max_nodes // n
    vb = values.reshape(S, n, -1)
    valid = graph.node_mask.reshape(S, n)
    w = graph.scene_adj[None] * valid[:, None, :]          # [S, dst, src]
    deg = jnp.maximum(w.sum(-1, keepdims=True), 1.0)
    out = jnp.einsum("sij,sjd->sid", w / deg, vb)
    return out.reshape(graph.max_nodes, -1)


def block_max_agg(values: jax.Array, graph) -> jax.Array:
    """Masked max aggregation for block-diagonal scene batches (dense)."""
    n = graph.scene_stride
    S = graph.max_nodes // n
    vb = values.reshape(S, n, -1)
    valid = graph.node_mask.reshape(S, n)
    sel = (graph.scene_adj[None] > 0) & valid[:, None, :]   # [S, dst, src]
    cand = jnp.where(sel[..., None], vb[:, None, :, :], _NEG)
    mx = cand.max(axis=2)                                   # [S, dst, D]
    any_e = sel.any(axis=2)[..., None]
    return jnp.where(any_e, mx, 0.0).reshape(graph.max_nodes, -1)


def segment_max_agg(values: jax.Array, edge_src: jax.Array,
                    edge_dst: jax.Array, num_nodes: int,
                    edge_mask: jax.Array) -> jax.Array:
    """Masked max aggregation over in-neighbours (edge-list form).

    out[v] = max_{e: dst_e = v, valid} values[src_e]; nodes with no valid
    in-edges aggregate to zeros. The segment tier's third reduction
    (BASELINE.json:5 segment sum/mean/max).
    """
    msgs = jnp.where(edge_mask[:, None], values[edge_src], _NEG)
    mx = jax.ops.segment_max(msgs, edge_dst, num_segments=num_nodes)
    has = jax.ops.segment_sum(edge_mask.astype(jnp.int32), edge_dst,
                              num_segments=num_nodes) > 0
    return jnp.where(has[:, None], jnp.where(jnp.isfinite(mx), mx, _NEG), 0.0)


def segment_mean_agg(values: jax.Array, edge_src: jax.Array, edge_dst: jax.Array,
                     num_nodes: int, edge_mask: jax.Array) -> jax.Array:
    """Mean aggregation over in-neighbours (config ``two_robot_mean``).

    out[v] = mean_{e: dst_e = v} values[src_e]; nodes with no valid in-edges
    aggregate to zeros.
    """
    w = edge_mask.astype(values.dtype)
    summed = spmm(jnp.ones_like(w), values, edge_src, edge_dst, num_nodes, edge_mask)
    deg = jax.ops.segment_sum(w, edge_dst, num_segments=num_nodes)
    return summed / jnp.maximum(deg, 1.0)[:, None]


# --- ELL (padded neighbour-list) ops ----------------------------------------
# The TPU-idiomatic sparse layout (GraphBatch.ell_src/ell_mask): every
# destination's in-edges sit in a fixed-width row, so the segment softmax is
# a masked row softmax and aggregation is a regular gather + weighted sum —
# no scatter. These are the XLA oracles for the Pallas ELL kernels.


def ell_sddmm(q: jax.Array, k: jax.Array, ell_src: jax.Array,
              ell_mask: jax.Array) -> jax.Array:
    """logits[v, j] = <q[v], k[ell_src[v, j]]>; masked slots -> 0."""
    gathered = k[ell_src]                      # [V, max_deg, dk]
    logits = jnp.einsum("vd,vjd->vj", q, gathered)
    return jnp.where(ell_mask, logits, 0.0)


def ell_softmax(logits: jax.Array, ell_mask: jax.Array) -> jax.Array:
    """Masked softmax along the neighbour axis; all-masked rows -> zeros."""
    x = jnp.where(ell_mask, logits, _NEG)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - jax.lax.stop_gradient(jnp.maximum(m, _NEG / 2)))
    e = jnp.where(ell_mask, e, 0.0)
    denom = e.sum(-1, keepdims=True)
    return jnp.where(denom > 0, e / jnp.maximum(denom, 1e-30), 0.0)


def ell_aggregate(weights: jax.Array, values: jax.Array, ell_src: jax.Array,
                  ell_mask: jax.Array, mode: str = "sum") -> jax.Array:
    """out[v] = reduce_j weights[v, j] * values[ell_src[v, j]].

    mode: "sum" (weighted, e.g. attention), "mean", or "max" (weights
    ignored for max). The segment-aggregation op of the contract
    (BASELINE.json:5) in ELL form.
    """
    gathered = values[ell_src]                 # [V, max_deg, D]
    maskf = ell_mask.astype(values.dtype)[..., None]
    if mode == "sum":
        return jnp.einsum("vj,vjd->vd", weights * ell_mask, gathered)
    if mode == "mean":
        deg = jnp.maximum(maskf.sum(1), 1.0)
        return (gathered * maskf).sum(1) / deg
    if mode == "max":
        neg = jnp.full_like(gathered, _NEG)
        mx = jnp.where(maskf > 0, gathered, neg).max(1)
        return jnp.where(maskf.sum(1) > 0, mx, 0.0)
    raise ValueError(f"unknown mode {mode!r}")
