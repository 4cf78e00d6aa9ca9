"""Raw hardware capability probe: dispatch floor, HBM bandwidth, MXU peak.

Establishes the real roofline constants for THIS chip (the axon-tunneled
TPU v5 lite) so bench.py's speed-of-light fractions are honest.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/hw_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def best_time(f, *args, reps=6):
    import jax
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # 1. dispatch floor
    tiny = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    t = best_time(f, tiny, reps=20)
    log(f"dispatch floor       : {t*1e6:8.1f} us")

    # 2. HBM bandwidth: elementwise add over a big buffer (read+write), and
    #    a row permutation (gather; read+write, no fusion tricks).
    for mb in (64, 256):
        n = mb * 1024 * 1024 // 4
        x = jnp.arange(n, dtype=jnp.float32).reshape(-1, 1024)
        t = best_time(jax.jit(lambda x: x + 1.0), x)
        log(f"add {mb:4d}MB          : {t*1e6:8.1f} us -> "
            f"{2*mb/1024/t:7.1f} GB/s")
        perm = jnp.asarray(np.random.default_rng(0).permutation(x.shape[0]))
        t = best_time(jax.jit(lambda x, p: x[p]), x, perm)
        log(f"permute rows {mb:4d}MB : {t*1e6:8.1f} us -> "
            f"{2*mb/1024/t:7.1f} GB/s")

    # 3. MXU peak: square bf16 matmul
    for m in (2048, 4096, 8192):
        a = jnp.ones((m, m), jnp.bfloat16)
        t = best_time(jax.jit(lambda a: (a @ a).astype(jnp.bfloat16)), a)
        log(f"matmul {m}^3 bf16   : {t*1e6:8.1f} us -> "
            f"{2*m**3/t/1e12:7.1f} TFLOP/s")

    # 4. the batched tiny matmul shape of the fusion block, ONE dispatch,
    #    scaled up 8x to amortize dispatch.
    S, n, D = 8192, 8, 2048
    alpha = jnp.ones((S, n, n), jnp.bfloat16) / n
    v = jnp.ones((S, n, D), jnp.bfloat16)
    f = jax.jit(lambda a, v: jnp.einsum("sij,sjd->sid", a, v))
    t = best_time(f, alpha, v)
    bytes_rw = 2 * S * n * D * 2
    log(f"batched 8x8 einsum   : {t*1e6:8.1f} us -> "
        f"{bytes_rw/t/1e9:7.1f} GB/s effective "
        f"({S*n*(n-1)/t/1e6:7.1f}M edges/s at S={S})")

    # 5. same math as one [128,128] block-diag matmul per 16 scenes (pallas
    #    kernel layout) expressed in XLA: [V/128, 128, D] x [128, 128]
    V = S * n
    big = jnp.kron(jnp.eye(16, dtype=jnp.bfloat16),
                   jnp.ones((n, n), jnp.bfloat16) / n)   # [128,128]
    v2 = v.reshape(V // 128, 128, D)
    f = jax.jit(lambda b, v: jnp.einsum("ij,sjd->sid", b, v))
    t = best_time(f, big, v2)
    log(f"tiled 128-blockmm    : {t*1e6:8.1f} us -> "
        f"{bytes_rw/t/1e9:7.1f} GB/s effective "
        f"({S*n*(n-1)/t/1e6:7.1f}M edges/s)")


if __name__ == "__main__":
    main()
