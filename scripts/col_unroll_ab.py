"""Interleaved chip A/B for the >64-column one-hot selection loop forms.

Round-5 experiment (BASELINE.md "Manual partial unroll"): Mosaic's loop
lowering supports only unroll=1 or full, and full unroll overflows the
scoped-VMEM stack past ~64 columns — so `pallas_bsp._col_loop` manually
partial-unrolls (u statically unrolled bodies per fori trip at dynamic
column offsets). This script reproduces the adoption evidence: the
rolled form vs manual u=8 and the adopted u=32 on the deg-255 expanded
one-pass attention, forward and training direction, interleaved with
alternating order per repo timing protocol (single-dispatch timings over
the axon tunnel are meaningless — scan chains only). The original
adoption session also swept u=16 (BASELINE.md table).

Adopted verdict (2026-08-21): u=32 — fwd 265M -> 390M edges/s, train
92M -> 140M, outputs bit-identical across all forms.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/col_unroll_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_homogeneous, fully_connected_edges
    from mrp_gnn_tpu.ops import pallas_bsp as B

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    n, s = 256, 32  # deg-255, W=128 — the rolled-loop regime
    V = ((n * s + 127) // 128) * 128
    gb = batch_homogeneous(s, n, fully_connected_edges(n), max_nodes=V)
    E = int(np.asarray(gb.n_edges))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
    v = (jnp.asarray(rng.normal(size=(V, 2048)).astype(np.float32))
         .astype(jnp.bfloat16))
    iters = 20
    adopted = B._FORI_UNROLL

    def make(unroll, train):
        B._FORI_UNROLL = unroll
        if train:
            def link(q, k, c):
                loss = lambda vv: jnp.sum(
                    B.expanded_attention_fused(q, k, vv, gb)
                    .astype(jnp.float32) ** 2)
                return jax.grad(loss)(c).astype(c.dtype)
        else:
            def link(q, k, c):
                return B.expanded_attention_fused(q, k, c, gb).astype(c.dtype)

        def chained(q, k, v):
            return jax.lax.scan(lambda c, _: (link(q, k, c), ()), v, None,
                                length=iters)[0]

        fn = jax.jit(chained)
        out = fn(q, k, v)
        jax.block_until_ready(out)
        B._FORI_UNROLL = adopted

        def timed():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, k, v))
            return time.perf_counter() - t0

        return timed, out

    variants, outs = {}, {}
    for u in (1, 8, 32):
        tag = "roll" if u == 1 else f"u{u}"
        variants[f"fwd_{tag}"], outs[u] = make(u, False)
        variants[f"train_{tag}"], _ = make(u, True)
    for u in (8, 32):
        err = float(jnp.abs(outs[1].astype(jnp.float32)
                            - outs[u].astype(jnp.float32)).max())
        print(f"fwd agreement roll vs u{u}: {err}", file=sys.stderr,
              flush=True)
        assert err == 0.0, "unroll forms must be bit-identical"

    rates = {name: [] for name in variants}
    items = list(variants.items())
    for r in range(6):
        order = items if r % 2 == 0 else items[::-1]
        for name, fn in order:
            rates[name].append(E * iters / fn())
        print(f"round {r}: " + "  ".join(
            f"{nm}={rates[nm][-1] / 1e6:,.1f}M" for nm in rates),
            file=sys.stderr, flush=True)
    for nm, rs in rates.items():
        print(f"{nm}: best={max(rs)/1e6:,.1f}M mean={np.mean(rs)/1e6:,.1f}M "
              f"std={np.std(rs)/1e6:,.1f}M")
    print("fwd u32/roll:",
          round(np.mean(rates["fwd_u32"]) / np.mean(rates["fwd_roll"]), 3),
          " train u32/roll:",
          round(np.mean(rates["train_u32"]) / np.mean(rates["train_roll"]),
                3))


if __name__ == "__main__":
    main()
