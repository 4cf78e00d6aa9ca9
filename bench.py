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


def bench_edge_block(ops_impl: str, V, E, D, dk, iters, warmup) -> float:
    """Returns steady-state edges/s for one fused edge block."""
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch

    scenes, robots = V // 8, 8  # 8-robot swarm scenes
    gb = batch_fully_connected(scenes, robots, max_nodes=V, max_edges=E)
    ops = dispatch.get_ops(ops_impl)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))

    fn = jax.jit(lambda q, k, v: default_edge_fusion(ops, "attention",
                                                     q, k, v, gb))
    out = fn(q, k, v)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(q, k, v)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q, k, v)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    edges = int(np.asarray(gb.n_edges))
    return edges * iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--nodes", type=int, default=1024)
    p.add_argument("--feature_dim", type=int, default=2048)
    args = p.parse_args()

    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    V, dk = args.nodes, 64
    D = args.feature_dim
    E = V * 7  # 8-robot fully-connected scenes: 56 edges per 8 nodes

    results = {}
    for impl in ("xla", "pallas"):
        try:
            eps = bench_edge_block(impl, V, E, D, dk,
                                   args.iters, args.warmup)
            results[impl] = eps
            log(f"{impl}: {eps:,.0f} edges/s  (V={V} E={E} D={D})")
        except Exception as e:  # pallas kernels may not exist yet
            log(f"{impl}: unavailable ({type(e).__name__}: {e})")

    # HBM roofline: the SpMM alone must read E*D*4 bytes of source values
    # and write V*D*4 bytes of aggregates. v5e HBM ~ 819 GB/s.
    hbm = 819e9
    sol = hbm / (D * 4)
    log(f"HBM roofline (SpMM gather-bound): {sol:,.0f} edges/s")

    best_impl = max(results, key=results.get)
    best = results[best_impl]
    vs = best / results["xla"] if "xla" in results else 1.0
    log(f"best={best_impl} fraction_of_roofline={best / sol:.3f}")
    print(json.dumps({
        "metric": f"fusion_edge_block_edges_per_s_{best_impl}",
        "value": round(best, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
