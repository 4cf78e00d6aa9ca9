"""Pallas TPU kernels for the graph fusion edge ops.

The flagship kernel is ``block_fused_attention``: for block-diagonal scene
batches (GraphBatch.scene_stride > 0) the whole SDDMM -> segment-softmax ->
SpMM chain collapses into batched dense masked attention. The kernel packs
``tile_nodes // n`` scenes into one [T, T] MXU tile: per grid step it does
two small matmuls (logits, aggregate) entirely in VMEM while value tiles
stream from HBM exactly once — no gather, no scatter, bandwidth-bound at
speed of light (SURVEY.md section 2.2; BASELINE.json:5).

Numerics match mrp_gnn_tpu.ops.reference.block_fused_attention (the XLA
oracle) to float32 tolerance; tests compare both and check gradients.

Irregular (non-block) graphs fall back to the XLA edge-list ops for now;
sddmm / segment_softmax / spmm re-export the reference implementations so
the "pallas" backend is always complete.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrp_gnn_tpu.ops.reference import (  # noqa: F401  (re-exported fallbacks)
    sddmm,
    segment_mean_agg,
    segment_softmax,
    spmm,
)

_NEG = -1e30


def _pick_tiles(V: int, D: int, n: int, interpret: bool):
    """Choose (node_tile, feat_tile) or None if unsupported on hardware."""
    node_tile = 0
    for t in (256, 128, 64, 32, 16, 8):
        if V % t == 0 and t % n == 0:
            node_tile = t
            break
    if not node_tile:
        if interpret and V % n == 0:
            node_tile = V  # CPU interpret mode: no alignment constraints
        else:
            return None
    feat_tile = None
    for t in (2048, 1024, 512, 256, 128):
        if D % t == 0:
            feat_tile = t
            break
    if feat_tile is None:
        if not interpret:
            return None
        feat_tile = D
    return node_tile, feat_tile


def _attn_kernel(bias_ref, q_ref, k_ref, valid_ref, v_ref, out_ref, alpha_ref):
    """One (node_tile, feat_tile) grid step of block attention.

    The attention matrix is computed once per node tile (feature dim is the
    fastest grid axis) and cached in VMEM scratch for the remaining feature
    tiles; each step is then a single full-width MXU matmul.
    """

    @pl.when(pl.program_id(1) == 0)
    def _compute_alpha():
        # q @ k^T without an explicit transpose (contract last dims); the
        # 1/sqrt(dk) attention scale is pre-folded into q by the caller so
        # the kernel's logits matmul carries it for free.
        logits = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # bias: -inf outside scene-block adjacency; mask invalid sources.
        logits = logits + bias_ref[:]
        logits = jnp.where(valid_ref[:].T > 0, logits, _NEG)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - jnp.maximum(m, _NEG / 2))
        denom = jnp.sum(e, axis=-1, keepdims=True)
        alpha = jnp.where(denom > 1e-20, e / jnp.maximum(denom, 1e-30), 0.0)
        # alpha is cached in the VALUES dtype: for bf16 values the aggregate
        # matmul then runs bf16 x bf16 on the MXU with f32 accumulation.
        alpha_ref[:] = alpha.astype(alpha_ref.dtype)

    out_ref[:] = jnp.dot(alpha_ref[:], v_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _tile_bias(scene_adj: jax.Array, n: int, node_tile: int) -> jax.Array:
    """[T, T] additive bias: 0 on intra-scene edges, -inf elsewhere.

    The scene pattern repeats every n nodes, so one tile serves every grid
    step (scene blocks never straddle tiles since node_tile % n == 0).
    """
    reps = node_tile // n
    eye = jnp.eye(reps, dtype=scene_adj.dtype)
    big = jnp.kron(eye, scene_adj)  # block-diagonal [T, T]
    return jnp.where(big > 0, 0.0, _NEG).astype(jnp.float32)


def _forward(q, k, values, valid, bias, node_tile, feat_tile, interpret):
    V, D = values.shape
    dk = q.shape[-1]
    grid = (V // node_tile, D // feat_tile)
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((node_tile, node_tile), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # bias
            pl.BlockSpec((node_tile, dk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # q
            pl.BlockSpec((node_tile, dk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # k
            pl.BlockSpec((node_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # valid
            pl.BlockSpec((node_tile, feat_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),           # values
        ],
        out_specs=pl.BlockSpec((node_tile, feat_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, D), values.dtype),
        scratch_shapes=[pltpu.VMEM((node_tile, node_tile), values.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * V * node_tile * (dk + D),
            bytes_accessed=(V * D * values.dtype.itemsize * 2
                            + V * dk * 4 * 2 * (D // feat_tile)),
            transcendentals=V * node_tile * (D // feat_tile),
        ),
        interpret=interpret,
    )(bias, q, k, valid, values)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _block_attn(q, k, values, valid, bias, node_tile, feat_tile, interpret):
    return _forward(q, k, values, valid, bias, node_tile, feat_tile, interpret)


def _block_attn_fwd(q, k, values, valid, bias, node_tile, feat_tile, interpret):
    out = _forward(q, k, values, valid, bias, node_tile, feat_tile, interpret)
    return out, (q, k, values, valid, bias)


def _block_attn_bwd(node_tile, feat_tile, interpret, res, g):
    """Backward via the same block-dense math in XLA (einsum-lowered to MXU).

    alpha is recomputed from the saved small tensors; no [V, V]-scale
    intermediates are ever materialized because everything stays [S, T, T]
    tiled by XLA. Moving this into a Pallas kernel is a further optimization.
    """
    q, k, values, valid, bias = res
    V, D = values.shape
    dk = q.shape[-1]
    T = node_tile
    S = V // T
    qb = q.reshape(S, T, dk)
    kb = k.reshape(S, T, dk)
    vb = values.reshape(S, T, D)
    gb = g.reshape(S, T, D)
    validb = valid.reshape(S, T)

    # the 1/sqrt(dk) scale is pre-folded into q by block_fused_attention, so
    # the recomputed logits and the q/k cotangents carry no explicit scale
    # (the outer fold op transposes the scale onto dq automatically).
    logits = jnp.einsum("sid,sjd->sij", qb.astype(jnp.float32),
                        kb.astype(jnp.float32))
    logits = logits + bias[None]
    logits = jnp.where(validb[:, None, :] > 0, logits, _NEG)
    m = jnp.max(logits, -1, keepdims=True)
    e = jnp.exp(logits - jnp.maximum(m, _NEG / 2))
    denom = e.sum(-1, keepdims=True)
    alpha = jnp.where(denom > 1e-20, e / jnp.maximum(denom, 1e-30), 0.0)
    alpha = alpha.astype(vb.dtype)

    dv = jnp.einsum("sij,sid->sjd", alpha, gb).reshape(V, D)
    dalpha = jnp.einsum("sid,sjd->sij", gb, vb).astype(jnp.float32)
    alpha32 = alpha.astype(jnp.float32)
    dlogits = alpha32 * (dalpha - jnp.sum(alpha32 * dalpha, -1, keepdims=True))
    dq = jnp.einsum("sij,sjd->sid", dlogits,
                    kb.astype(jnp.float32)).reshape(V, dk)
    dk_ = jnp.einsum("sij,sid->sjd", dlogits,
                     qb.astype(jnp.float32)).reshape(V, dk)
    return (dq.astype(q.dtype), dk_.astype(k.dtype), dv.astype(values.dtype),
            jnp.zeros_like(valid), jnp.zeros_like(bias))


_block_attn.defvjp(_block_attn_fwd, _block_attn_bwd)


def block_fused_attention(q: jax.Array, k: jax.Array, values: jax.Array,
                          graph) -> jax.Array:
    """Pallas fused attention for block-diagonal scene batches.

    Falls back to the XLA block path when shapes don't tile onto the
    hardware (tiny CI shapes run the kernel in interpret mode on CPU).
    """
    from mrp_gnn_tpu.ops import reference as R

    V, D = values.shape
    n = graph.scene_stride
    interpret = jax.default_backend() == "cpu"
    tiles = _pick_tiles(V, D, n, interpret)
    if tiles is None:
        return R.block_fused_attention(q, k, values, graph)
    node_tile, feat_tile = tiles

    f32 = jnp.float32
    bias = _tile_bias(graph.scene_adj, n, node_tile)
    valid = graph.node_mask.astype(f32)[:, None]
    # Fold the attention scale into q (free in the kernel's logits matmul);
    # run q/k through the MXU in the values dtype — bf16 inputs with f32
    # accumulation on the bf16 path, f32 otherwise.
    qk_dtype = values.dtype if values.dtype == jnp.bfloat16 else f32
    q = (q.astype(f32) / np.sqrt(q.shape[-1])).astype(qk_dtype)
    return _block_attn(q, k.astype(qk_dtype), values, valid, bias,
                       node_tile, feat_tile, interpret)
