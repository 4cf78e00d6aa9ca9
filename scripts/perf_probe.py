"""Component-level perf probe for the fusion edge block on the real chip.

Times each candidate bottleneck in isolation with the same chained-scan
methodology as bench.py so the numbers are directly comparable:
  stream    : v = v * c                      (pure HBM stream floor)
  aggmm     : out = block_matmul(alpha_fixed, v)   (the SpMM-as-matmul alone)
  xla_block : full block_fused_attention, XLA path
  pallas    : full block_fused_attention, Pallas kernel
Run: python scripts/perf_probe.py [--iters 50]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters, reps=4):
    import jax
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--nodes", type=int, default=8192)
    p.add_argument("--feature_dim", type=int, default=2048)
    p.add_argument("--robots", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.ops import pallas_edge, reference as R

    V, D, n = args.nodes, args.feature_dim, args.robots
    dk = 64
    E = V * (n - 1)
    S = V // n
    gb = batch_fully_connected(S, n, max_nodes=V, max_edges=E)
    log(f"backend={jax.default_backend()} V={V} D={D} n={n} E={E}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)).astype(jnp.bfloat16)
    alpha = jnp.asarray(
        rng.uniform(size=(S, n, n)).astype(np.float32)).astype(jnp.bfloat16)

    it = args.iters

    def scan(body):
        def chained(v):
            def step(v, _):
                return body(v).astype(v.dtype), ()
            return jax.lax.scan(step, v, None, length=it)[0]
        return chained

    bw = 819e9
    floor = 2 * V * D * 2 / bw  # bf16 read+write once

    t = timeit(scan(lambda v: v * 1.0009765625), v, iters=it)
    log(f"stream      : {t*1e6:9.1f} us/iter  ({E/t/1e6:7.1f}M edges/s equiv; "
        f"bf16 rw floor {floor*1e6:.1f} us)")

    def aggmm(v):
        vb = v.reshape(S, n, D)
        return jnp.einsum("sij,sjd->sid", alpha, vb).reshape(V, D)
    t = timeit(scan(aggmm), v, iters=it)
    log(f"agg einsum  : {t*1e6:9.1f} us/iter  ({E/t/1e6:7.1f}M edges/s)")

    t = timeit(scan(lambda v: R.block_fused_attention(q, k, v, gb)), v, iters=it)
    log(f"xla block   : {t*1e6:9.1f} us/iter  ({E/t/1e6:7.1f}M edges/s)")

    t = timeit(scan(lambda v: pallas_edge.block_fused_attention(q, k, v, gb)),
               v, iters=it)
    log(f"pallas block: {t*1e6:9.1f} us/iter  ({E/t/1e6:7.1f}M edges/s)")

    # alpha-precomputed Pallas matmul-only variant: measures the kernel's
    # aggregate loop without the softmax recompute.
    tiles = pallas_edge._pick_tiles(V, D, n, False)
    if tiles:
        nt, ft = tiles
        bias = pallas_edge._tile_bias(gb.scene_adj, n, nt)
        valid = gb.node_mask.astype(jnp.float32)[:, None]

        def pal(v):
            return pallas_edge._block_attn(q, k, v, valid, bias, nt, ft, False)
        t = timeit(scan(pal), v, iters=it)
        log(f"pallas nt={nt} ft={ft}: {t*1e6:9.1f} us/iter "
            f"({E/t/1e6:7.1f}M edges/s)")
        for nt2, ft2 in ((512, D), (256, D), (128, D), (512, 1024), (128, 512)):
            if V % nt2 or D % ft2 or nt2 % n:
                continue
            if nt2 == nt and ft2 == ft:
                continue
            try:
                bias2 = pallas_edge._tile_bias(gb.scene_adj, n, nt2)

                def pal2(v, b=bias2, a=nt2, f=ft2):
                    return pallas_edge._block_attn(q, k, v, valid, b, a, f, False)
                t = timeit(scan(pal2), v, iters=it)
                log(f"pallas nt={nt2} ft={ft2}: {t*1e6:9.1f} us/iter "
                    f"({E/t/1e6:7.1f}M edges/s)")
            except Exception as e:
                log(f"pallas nt={nt2} ft={ft2}: failed {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
