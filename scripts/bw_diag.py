"""Same-process diagnostic: stream-bw probes vs edge-block throughput.

Run on the TPU chip. All measurements in ONE process so tunnel variance
cancels; prints effective GB/s for each path to decide whether the fused
edge block is bandwidth-saturated or leaving headroom.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    V, D, dk, iters = 8192, 2048, 64, 50
    print("backend", jax.default_backend())

    # 1. row-permute chain (what bench.py measures)
    v = jnp.ones((V, D), jnp.bfloat16)
    perm = jnp.asarray(np.random.default_rng(0).permutation(V))
    f1 = jax.jit(lambda v: jax.lax.scan(
        lambda c, _: (c[perm], ()), v, None, length=iters)[0])
    t = timed(f1, v)
    print(f"permute-chain: {2*V*D*2*iters/t/1e9:,.1f} GB/s  ({t*1e3:.2f} ms)")

    # 1b. same but 8x larger buffer (does VMEM residency explain it?)
    Vb = V * 8
    vb = jnp.ones((Vb, D), jnp.bfloat16)
    permb = jnp.asarray(np.random.default_rng(0).permutation(Vb))
    f1b = jax.jit(lambda v: jax.lax.scan(
        lambda c, _: (c[permb], ()), v, None, length=iters)[0])
    t = timed(f1b, vb)
    print(f"permute-chain 256MB: {2*Vb*D*2*iters/t/1e9:,.1f} GB/s")

    # 2. elementwise copy chain (x = x * 1.0000001)
    f2 = jax.jit(lambda v: jax.lax.scan(
        lambda c, _: (c * jnp.bfloat16(1.0000001), ()), v, None,
        length=iters)[0])
    t = timed(f2, v)
    print(f"scale-chain 32MB: {2*V*D*2*iters/t/1e9:,.1f} GB/s")
    t = timed(f2, vb)  # shape-polymorphic? no — retrace
    f2b = jax.jit(lambda v: jax.lax.scan(
        lambda c, _: (c * jnp.bfloat16(1.0000001), ()), v, None,
        length=iters)[0])
    t = timed(f2b, vb)
    print(f"scale-chain 256MB: {2*Vb*D*2*iters/t/1e9:,.1f} GB/s")

    # 3. the edge block paths, effective GB/s (2*V*D*2 bytes/iter ideal)
    import dataclasses
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch

    E = V * 7
    gb = batch_fully_connected(V // 8, 8, max_nodes=V, max_edges=E)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32))
    vv = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)).astype(
        jnp.bfloat16)

    for impl in ("xla", "pallas"):
        ops = dispatch.get_ops(impl)

        def chained(q, k, v):
            def body(v, _):
                out = default_edge_fusion(ops, "attention", q, k, v, gb)
                return out.astype(v.dtype), ()
            return jax.lax.scan(body, v, None, length=iters)[0]

        fn = jax.jit(chained)
        t = timed(fn, q, k, vv)
        eps = E * iters / t
        print(f"{impl}_block: {eps/1e6:,.1f}M edges/s = "
              f"{2*V*D*2*iters/t/1e9:,.1f} GB/s effective")


if __name__ == "__main__":
    main()
