"""Headline benchmark: edges/s for the GNN fusion edge block on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is steady-state throughput of the attention edge block
(SDDMM -> segment-softmax -> SpMM) at a swarm-scale shape, per chip
(BASELINE.json:2). No published baseline exists (BASELINE.md) — the
reference repo has no throughput numbers — so vs_baseline is the ratio
against the XLA-reference-ops path measured in the same run (the "beat the
stock-compiler baseline" figure the Pallas kernels must justify).

Extra diagnostics (roofline bound, per-path timings) go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_edge_block(ops_impl: str, V, E, D, dk, iters, warmup,
                     kind: str = "block", bf16: bool = False) -> float:
    """Returns steady-state edges/s for one fused edge block.

    kind: "block" = dense block-diagonal fast path; "ell" = sparse
    neighbour-list (block metadata stripped); "scatter" = naive edge-list
    gather/scatter baseline (ELL stripped too).
    """
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch

    scenes, robots = V // 8, 8  # 8-robot swarm scenes
    gb = batch_fully_connected(scenes, robots, max_nodes=V, max_edges=E)
    if kind in ("ell", "scatter"):  # strip the dense block fast path
        gb = dataclasses.replace(gb, scene_adj=None, scene_stride=0)
    if kind == "scatter":           # strip ELL too -> edge-list baseline
        gb = dataclasses.replace(gb, ell_src=None, ell_mask=None,
                                 bsp_pair_dst=None, bsp_pair_src=None,
                                 bsp_pair_first=None, bsp_pair_last=None,
                                 bsp_tile=0)
    ops = dispatch.get_ops(ops_impl)

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)).astype(dtype)

    # Chain `iters` applications inside ONE jitted scan (output feeds the
    # next call's values — attention output is a convex combination of the
    # values, so the chain stays bounded) so per-dispatch overhead —
    # substantial on the tunneled axon platform — amortizes away and we time
    # the op itself.
    def chained(q, k, v):
        def body(v, _):
            out = default_edge_fusion(ops, "attention", q, k, v, gb)
            return out.astype(v.dtype), ()
        v, _ = jax.lax.scan(body, v, None, length=iters)
        return v

    fn = jax.jit(chained)
    jax.block_until_ready(fn(q, k, v))  # compile + warm
    reps = max(warmup // 2, 3)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(q, k, v)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    edges = int(np.asarray(gb.n_edges))
    return edges * iters / best


def bench_partitioned_local(ops_impl: str, V, E, D, dk, iters,
                            bf16: bool = True) -> float:
    """Per-chip throughput of the PARTITIONED edge block's local path
    (parallel/fused.py) on a 1-device graph mesh: all edges local, halo
    no-ops — measures what each shard of config 5 sustains between
    exchanges. The pallas backend routes the local aggregate through the
    tile-block-sparse SpMM kernel."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.partition import partition_graph

    scenes, robots = V // 8, 8
    gb = batch_fully_connected(scenes, robots, max_nodes=V, max_edges=E)
    gb = dataclasses.replace(gb, scene_adj=None, scene_stride=0)  # sparse league
    plan = partition_graph(gb, 1)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "graph"))
    ops = dispatch.get_ops(ops_impl)
    edge_fn = make_partitioned_edge_fusion(mesh, plan)

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jax.device_put(
        jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)).astype(dtype),
        NamedSharding(mesh, P(("data", "graph"))))

    def chained(q, k, v):
        def body(v, _):
            return edge_fn(ops, "attention", q, k, v, gb).astype(v.dtype), ()
        return jax.lax.scan(body, v, None, length=iters)[0]

    fn = jax.jit(chained)
    jax.block_until_ready(fn(q, k, v))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return int(np.asarray(gb.n_edges)) * iters / best


def measure_stream_bw(V: int, D: int, iters: int) -> float:
    """Empirical HBM stream bandwidth (bytes/s) via a chained row-permute.

    A data-dependent gather chain cannot be fused away, so per-iter time is
    a true read+write of the [V, D] bf16 buffer. Single-dispatch timing is
    unreliable over the axon tunnel (results appear cached); the chain
    matches the methodology of the edge-block measurement, so the roofline
    fraction is apples-to-apples.
    """
    import jax
    import jax.numpy as jnp
    v = jnp.ones((V, D), jnp.bfloat16)
    perm = jnp.asarray(np.random.default_rng(0).permutation(V))

    def chained(v):
        return jax.lax.scan(lambda c, _: (c[perm], ()), v, None,
                            length=iters)[0]

    fn = jax.jit(chained)
    jax.block_until_ready(fn(v))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v))
        best = min(best, time.perf_counter() - t0)
    return 2 * V * D * 2 * iters / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--nodes", type=int, default=8192)
    p.add_argument("--feature_dim", type=int, default=2048)
    args = p.parse_args()

    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    V, dk = args.nodes, 64
    D = args.feature_dim
    E = V * 7  # 8-robot fully-connected scenes: 56 edges per 8 nodes

    results = {}
    # leagues: *_block = dense block-diagonal; *_ell = sparse neighbour-list
    # (the pallas ELL path routes through the tile-block-sparse fused
    # kernels, ops/pallas_bsp.py); xla_sparse = naive edge-list baseline.
    variants = [("xla_sparse", "xla", "scatter", False),
                ("xla_ell", "xla", "ell", False),
                ("pallas_ell_bf16", "pallas", "ell", True),
                ("xla_block_bf16", "xla", "block", True),
                ("pallas_block_bf16", "pallas", "block", True)]
    for name, impl, kind, bf16 in variants:
        try:
            eps = bench_edge_block(impl, V, E, D, dk, args.iters, args.warmup,
                                   kind=kind, bf16=bf16)
            results[name] = eps
            log(f"{name}: {eps:,.0f} edges/s  (V={V} E={E} D={D})")
        except Exception as e:
            log(f"{name}: unavailable ({type(e).__name__}: {e})")

    # Diagnostics: the partitioned (config 5) edge block's per-chip local
    # path — the rate each shard sustains between boundary exchanges.
    for impl in ("xla", "pallas"):
        try:
            eps = bench_partitioned_local(impl, V, E, D, dk, args.iters,
                                          bf16=True)
            log(f"partitioned_local_{impl}_bf16: {eps:,.0f} edges/s")
        except Exception as e:
            log(f"partitioned_local_{impl}_bf16: unavailable "
                f"({type(e).__name__}: {e})")

    # Roofline from MEASURED stream bandwidth (the axon-tunneled chip
    # delivers far below the v5e spec sheet's 819 GB/s — see
    # scripts/hw_probe.py): the gather formulation reads E*D bf16 bytes of
    # source values; the block-dense formulation reads each value row once
    # (V*D read + V*D write) -- its edge rate is E/V times the row rate.
    hbm = measure_stream_bw(V, D, args.iters)
    log(f"measured stream bandwidth: {hbm/1e9:,.1f} GB/s")
    sol_gather = hbm / (D * 2)
    sol_block = hbm / (2 * V * D * 2 / E)
    log(f"bf16 roofline gather: {sol_gather:,.0f} edges/s; "
        f"block-dense: {sol_block:,.0f} edges/s")

    best_impl = max(results, key=results.get)
    best = results[best_impl]
    vs = best / results.get("xla_sparse", best)
    log(f"best={best_impl} fraction_of_block_roofline={best / sol_block:.3f}")
    print(json.dumps({
        "metric": f"fusion_edge_block_edges_per_s_{best_impl}",
        "value": round(best, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
