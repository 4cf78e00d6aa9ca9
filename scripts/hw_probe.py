"""Consolidated hardware / kernel probe for the axon-tunneled TPU chip.

One entry point for every one-off diagnostic used to establish the roofline
constants in BASELINE.md (supersedes the round-1 hw_probe{,2,3}.py,
bw_probe.py, bw_diag.py, perf_probe.py, kernel_probe.py sprawl — VERDICT
round 1, Weak item 7). Sections:

  dispatch  jit dispatch floor (tiny op round-trip)
  bw        HBM bandwidth: scan-chained scale / random gather / sequential
            gather / Pallas copy tiles — the scan-chain methodology is the
            reliable one here (single-dispatch timings appear cached over
            the axon tunnel)
  matmul    MXU peak: chained square matmuls, bf16 and f32
  edge      fusion edge block, component-by-component: stream floor, the
            SpMM-as-einsum alone, full XLA block path, full Pallas block
            kernel, plus Pallas tile variants
  kernel    block-kernel tile sweep (node tile x feature tile grid)

Run: PYTHONPATH=/root/repo python scripts/hw_probe.py --what bw,edge
     (default: all sections)

Methodology note: every measurement is a jax.lax.scan chain whose carried
value feeds the next iteration, so XLA must execute all `iters` bodies;
per-iter time = best-of-reps total / iters. The scale-chain control uses
1.0078125 (= 1 + 2^-7, exactly representable in bf16 and != 1.0) so the
algebraic simplifier cannot fold the multiply away (ADVICE round 1).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(body, init, iters=ITERS, reps=4):
    """Best-of-reps per-iteration time of a data-dependent scan chain."""
    import jax

    def chained(x):
        return jax.lax.scan(lambda c, _: (body(c), ()), x, None,
                            length=iters)[0]

    f = jax.jit(chained)
    jax.block_until_ready(f(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init))
        best = min(best, time.perf_counter() - t0)
    return best / iters


# bf16-exact scale factor != 1.0: 1 + 2^-7 (bf16 has 8 significand bits).
BF16_SCALE = 1.0078125


def sec_dispatch():
    import jax
    import jax.numpy as jnp
    tiny = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f(tiny))
    best = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(f(tiny))
        best = min(best, time.perf_counter() - t0)
    log(f"dispatch floor        : {best*1e6:8.1f} us")


def sec_bw():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, D = 8192, 2048
    mb = V * D * 2 / 1e6
    v = jnp.ones((V, D), jnp.bfloat16)

    # Collapsible CONTROL: XLA may fold the 50 constant multiplies into one
    # (x * c^50), so this is an upper bound, not a stream measurement.
    t = chain_time(lambda x: x * jnp.bfloat16(BF16_SCALE), v)
    log(f"scale chain {mb:4.0f}MB rw : {t*1e6:8.1f} us/iter -> "
        f"{2*mb/1e3/t:7.1f} GB/s  (collapsible control)")

    perm = jnp.asarray(np.random.default_rng(0).permutation(V))
    t = chain_time(lambda x: x[perm], v)
    log(f"random gather {mb:4.0f}MB : {t*1e6:8.1f} us/iter -> "
        f"{2*mb/1e3/t:7.1f} GB/s")

    shift = jnp.asarray((np.arange(V) + 64) % V)
    t = chain_time(lambda x: x[shift], v)
    log(f"seq gather {mb:4.0f}MB    : {t*1e6:8.1f} us/iter -> "
        f"{2*mb/1e3/t:7.1f} GB/s")

    # 8x buffer: rules out VMEM-residency flattering the 32MB numbers.
    V2 = 4 * V
    v2 = jnp.ones((V2, D), jnp.bfloat16)
    for name, idx in (("random", np.random.default_rng(1).permutation(V2)),
                      ("seq", (np.arange(V2) + 64) % V2)):
        ix = jnp.asarray(idx)
        t = chain_time(lambda x: x[ix], v2)
        log(f"{name:6s} gather {4*mb:4.0f}MB: {t*1e6:8.1f} us/iter -> "
            f"{8*mb/1e3/t:7.1f} GB/s")

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def pallas_copy(x, tile):
        return pl.pallas_call(
            copy_kernel,
            grid=(V // tile,),
            in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, D), x.dtype),
        )(x)

    for tile in (128, 256, 512):
        t = chain_time(lambda x, tl=tile: pallas_copy(x, tl), v)
        log(f"pallas copy T={tile:4d}   : {t*1e6:8.1f} us/iter -> "
            f"{2*mb/1e3/t:7.1f} GB/s")


def sec_matmul():
    import jax.numpy as jnp
    for m in (1024, 2048, 4096):
        a = (jnp.eye(m, dtype=jnp.bfloat16)
             + jnp.bfloat16(0.001) * jnp.ones((m, m), jnp.bfloat16))
        t = chain_time(lambda x: (x @ a * jnp.bfloat16(0.9921875)
                                  ).astype(x.dtype),
                       jnp.ones((m, m), jnp.bfloat16), iters=20)
        log(f"matmul chain {m}^3 bf16: {t*1e6:8.1f} us/iter -> "
            f"{2*m**3/t/1e12:7.1f} TFLOP/s")
    m = 2048
    a32 = jnp.eye(m) + 0.001
    t = chain_time(lambda x: x @ a32 * 0.999, jnp.ones((m, m)), iters=20)
    log(f"matmul chain {m}^3 f32 : {t*1e6:8.1f} us/iter -> "
        f"{2*m**3/t/1e12:7.1f} TFLOP/s")


def _edge_setup(V, D, n):
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    E = V * (n - 1)
    gb = batch_fully_connected(V // n, n, max_nodes=V, max_edges=E)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    return gb, q, k, v, E


def sec_edge(V=8192, D=2048, n=8):
    import jax.numpy as jnp
    from mrp_gnn_tpu.ops import pallas_edge, reference as R

    gb, q, k, v, E = _edge_setup(V, D, n)
    S = V // n
    log(f"edge block: V={V} D={D} n={n} E={E}")

    # Non-collapsible stream floor: shifted row gather forces a real
    # read+write of the buffer every iteration (sequential-friendly rows).
    shift = jnp.asarray((np.arange(V) + 64) % V)
    t = chain_time(lambda x: x[shift], v)
    log(f"stream floor : {t*1e6:9.1f} us/iter ({E/t/1e6:7.1f}M edges/s equiv)")

    alpha = jnp.asarray(np.random.default_rng(1).uniform(
        size=(S, n, n)).astype(np.float32)).astype(jnp.bfloat16)

    def aggmm(x):
        vb = x.reshape(S, n, D)
        return jnp.einsum("sij,sjd->sid", alpha, vb).reshape(V, D)
    t = chain_time(lambda x: aggmm(x).astype(x.dtype), v)
    log(f"agg einsum   : {t*1e6:9.1f} us/iter ({E/t/1e6:7.1f}M edges/s)")

    t = chain_time(lambda x: R.block_fused_attention(q, k, x, gb
                                                     ).astype(x.dtype), v)
    log(f"xla block    : {t*1e6:9.1f} us/iter ({E/t/1e6:7.1f}M edges/s)")

    t = chain_time(lambda x: pallas_edge.block_fused_attention(
        q, k, x, gb).astype(x.dtype), v)
    log(f"pallas block : {t*1e6:9.1f} us/iter ({E/t/1e6:7.1f}M edges/s)")


def sec_kernel(V=8192, D=2048, n=8):
    """Block-kernel tile sweep: node tile x feature tile."""
    import jax.numpy as jnp
    from mrp_gnn_tpu.ops import pallas_edge

    gb, q, k, v, E = _edge_setup(V, D, n)
    valid = gb.node_mask.astype(jnp.float32)[:, None]
    results = {}
    for T in (64, 128, 256):
        if V % T or T % n:
            continue
        bias = pallas_edge._tile_bias(gb.scene_adj, n, T)
        for ftile in (512, 1024, 2048):
            if D % ftile:
                continue
            def fn(x, T=T, ftile=ftile, bias=bias):
                return pallas_edge._block_attn(q, k, x, valid, bias, T, ftile,
                                               False).astype(x.dtype)
            try:
                t = chain_time(fn, v)
                results[f"T{T}-f{ftile}"] = E / t
            except Exception as e:
                log(f"T{T}-f{ftile}: FAIL {type(e).__name__}: {e}"[:160])
    for name, eps in sorted(results.items(), key=lambda kv: -kv[1]):
        log(f"pallas block {name:10s}: {eps/1e6:9.1f} M edges/s")


SECTIONS = {"dispatch": sec_dispatch, "bw": sec_bw, "matmul": sec_matmul,
            "edge": sec_edge, "kernel": sec_kernel}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="all",
                   help=f"comma list of {sorted(SECTIONS)} or 'all'")
    args = p.parse_args()
    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    names = sorted(SECTIONS) if args.what == "all" else args.what.split(",")
    for name in names:
        log(f"--- {name} ---")
        SECTIONS[name]()


if __name__ == "__main__":
    main()
