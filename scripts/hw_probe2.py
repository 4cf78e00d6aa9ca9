"""Scan-chained hardware probe (single-dispatch timing is unreliable over
the axon tunnel — results appear cached). Every measurement is a
jax.lax.scan chain whose iterations are data-dependent, so the device must
really execute `iters` copies of the body; per-iter time = total / iters.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/hw_probe2.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(body, init, iters=ITERS, reps=4):
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


def main():
    import jax
    import jax.numpy as jnp
    d = jax.devices()[0]
    log(f"backend={jax.default_backend()} dev={d}")
    try:
        ms = d.memory_stats()
        log(f"memory_stats: {ms}")
    except Exception as e:
        log(f"memory_stats unavailable: {e}")

    V, D = 8192, 2048
    mb = V * D * 2 / 1e6
    v = jnp.ones((V, D), jnp.bfloat16)
    perm = jnp.asarray(np.random.default_rng(0).permutation(V))

    # elementwise multiply: collapsible across iterations (upper bound/control)
    t = chain_time(lambda x: x * jnp.bfloat16(1.001), v)
    log(f"mul chain (collapsible) : {t*1e6:8.1f} us/iter")

    # row-permute gather: NOT collapsible -> true read+write of {mb}MB
    t = chain_time(lambda x: x[perm], v)
    log(f"perm chain {mb:.0f}MB rw   : {t*1e6:8.1f} us/iter -> "
        f"{2*mb/1e3/t:7.1f} GB/s")

    # bigger buffer
    V2 = 4 * V
    v2 = jnp.ones((V2, D), jnp.bfloat16)
    perm2 = jnp.asarray(np.random.default_rng(1).permutation(V2))
    t = chain_time(lambda x: x[perm2], v2)
    log(f"perm chain {4*mb:.0f}MB rw  : {t*1e6:8.1f} us/iter -> "
        f"{8*mb/1e3/t:7.1f} GB/s")

    # MXU: chained square matmul, data-dependent
    for m in (1024, 2048, 4096):
        a = (jnp.eye(m, dtype=jnp.bfloat16)
             + 0.001 * jnp.ones((m, m), jnp.bfloat16))
        t = chain_time(lambda x: (x @ a * jnp.bfloat16(0.999)).astype(x.dtype),
                       jnp.ones((m, m), jnp.bfloat16), iters=20)
        log(f"matmul chain {m}^3 bf16: {t*1e6:8.1f} us/iter -> "
            f"{2*m**3/t/1e12:7.1f} TFLOP/s")

    # f32 matmul for comparison
    m = 2048
    a32 = jnp.eye(m) + 0.001
    t = chain_time(lambda x: x @ a32 * 0.999, jnp.ones((m, m)), iters=20)
    log(f"matmul chain {m}^3 f32 : {t*1e6:8.1f} us/iter -> "
        f"{2*m**3/t/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
