"""Probe: block-fused attention kernel variants on the real chip.

The shipped MXU kernel packs r = T/n scenes into one [T, T] tile, so the
aggregate matmul multiplies by a block-diagonal alpha that is (T/n)x zeros
-> wasted MXU FLOPs. Variants probed here:
  A. mxu-T{32,64,128,256}: current kernel at different node tiles.
  B. vpu: per-scene formulation — alpha kept as [T, n] (row-aligned), the
     aggregate is n VPU FMAs of [T, ft] tiles (2n flops/element, the true
     minimum), so the kernel should be HBM-bound.
Measured with the same chained-scan methodology as bench.py.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


# ---------------------------------------------------------------- VPU kernel
def _vpu_kernel(n: int, adjm_ref, q_ref, k_ref, validn_ref, v_ref, out_ref,
                alpha_ref):
    """Per-scene attention with row-aligned [T, n] alpha.

    adjm_ref: [T, n] additive mask tile (0 on allowed intra-scene edge, -NEG
              otherwise), the scene adjacency tiled over r scenes.
    validn_ref: [T, n] column-j-source-validity per row (precomputed).
    alpha_ref: [T, n] f32 scratch, cached across feature-tile grid steps.
    """

    @pl.when(pl.program_id(1) == 0)
    def _alpha():
        T, dk = q_ref.shape
        r = T // n
        q = q_ref[:]
        kb = k_ref[:].reshape(r, n, dk)
        cols = []
        for j in range(n):
            krows = jnp.broadcast_to(kb[:, j][:, None, :], (r, n, dk))
            krows = krows.reshape(T, dk)
            lj = jnp.sum(q * krows, axis=-1, keepdims=True) / np.sqrt(dk)
            cols.append(lj)
        logits = jnp.concatenate(cols, axis=-1)  # [T, n]
        logits = logits + adjm_ref[:] + validn_ref[:]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - jnp.maximum(m, _NEG / 2))
        d = jnp.sum(e, axis=-1, keepdims=True)
        alpha_ref[:] = jnp.where(d > 1e-20, e / jnp.maximum(d, 1e-30), 0.0)

    T, ft = v_ref.shape
    r = T // n
    vb = v_ref[:].reshape(r, n, ft)
    alpha = alpha_ref[:]
    acc = jnp.zeros((T, ft), jnp.float32)
    for j in range(n):
        vrows = jnp.broadcast_to(vb[:, j][:, None, :], (r, n, ft))
        vrows = vrows.reshape(T, ft).astype(jnp.float32)
        acc = acc + alpha[:, j:j + 1] * vrows
    out_ref[:] = acc.astype(out_ref.dtype)


def vpu_block_attention(q, k, values, valid, scene_adj, n, node_tile,
                        feat_tile, interpret=False):
    V, D = values.shape
    dk = q.shape[-1]
    T = node_tile
    r = T // n
    adjm = jnp.where(jnp.tile(scene_adj, (r, 1)) > 0, 0.0, _NEG
                     ).astype(jnp.float32)  # [T, n]
    # validity of source j for each row: valid.reshape(-1, n)[:, j] broadcast
    vb = valid.reshape(V // n, n)
    validn = jnp.repeat(vb, n, axis=0)  # [V, n]; row i sees its scene's mask
    validn = jnp.where(validn > 0, 0.0, _NEG).astype(jnp.float32)
    grid = (V // T, D // feat_tile)
    return pl.pallas_call(
        functools.partial(_vpu_kernel, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, dk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, dk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, feat_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, feat_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, D), values.dtype),
        scratch_shapes=[pltpu.VMEM((T, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * V * n * D,
            bytes_accessed=V * D * values.dtype.itemsize * 2,
            transcendentals=V * n,
        ),
        interpret=interpret,
    )(adjm, q, k, validn, values)


def time_chain(fn, q, k, v, iters):
    def chained(q, k, v):
        def body(v, _):
            return fn(q, k, v).astype(v.dtype), ()
        return jax.lax.scan(body, v, None, length=iters)[0]

    cf = jax.jit(chained)
    jax.block_until_ready(cf(q, k, v))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(cf(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.ops import pallas_edge
    from mrp_gnn_tpu.ops import reference as R

    V, D, dk, n = 8192, 2048, 64, 8
    E = V * (n - 1)
    iters = 50
    gb = batch_fully_connected(V // n, n, max_nodes=V, max_edges=E)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    valid = gb.node_mask.astype(jnp.float32)

    # correctness of the VPU variant vs the XLA oracle
    want = R.block_fused_attention(q, k, v, gb)
    got = vpu_block_attention(q, k, v, valid, gb.scene_adj, n, 256, 512)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"vpu max abs err vs oracle: {err:.5f}", file=sys.stderr)

    results = {}
    for T in (32, 64, 128, 256):
        for ftile in (512, 1024):
            name = f"mxu-T{T}-f{ftile}"
            bias = pallas_edge._tile_bias(gb.scene_adj, n, T)
            fn = lambda q, k, v, T=T, ftile=ftile, bias=bias: \
                pallas_edge._forward(q, k, v, valid[:, None], bias, T, ftile,
                                     False)
            try:
                t = time_chain(fn, q, k, v, iters)
                results[name] = E / t
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {e}"[:200],
                      file=sys.stderr)
    for T in (64, 128, 256, 512):
        for ftile in (512, 1024, 2048):
            name = f"vpu-T{T}-f{ftile}"
            fn = lambda q, k, v, T=T, ftile=ftile: vpu_block_attention(
                q, k, v, valid, gb.scene_adj, n, T, ftile)
            try:
                t = time_chain(fn, q, k, v, iters)
                results[name] = E / t
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {e}"[:200],
                      file=sys.stderr)

    for name, eps in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{name:18s} {eps/1e6:9.1f} M edges/s")


if __name__ == "__main__":
    main()
