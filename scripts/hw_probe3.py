"""Probe 3: sequential vs random HBM access, and Pallas-achievable copy
bandwidth — to find the real roofline for the block fusion kernel.

xla_ell's gather+einsum moves ~537MB in ~2.57ms (~209GB/s), above the
random-permute "stream bandwidth" (119GB/s). Hypothesis: sequential streams
run ~2x faster than random row gathers on this chip, so the block path
(~129GB/s effective) still has headroom.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    log(f"backend={jax.default_backend()}")

    V, D = 8192, 2048
    mb = V * D * 2 / 1e6  # bf16 buffer MB
    v = jnp.ones((V, D), jnp.bfloat16)

    # random-permute gather (baseline from probe2)
    perm = jnp.asarray(np.random.default_rng(0).permutation(V))
    t = chain_time(lambda x: x[perm], v)
    log(f"random perm gather : {t*1e6:8.1f} us/iter -> {2*mb/1e3/t:7.1f} GB/s")

    # shifted-identity gather: same gather HLO, sequential-friendly rows
    shift = jnp.asarray((np.arange(V) + 64) % V)
    t = chain_time(lambda x: x[shift], v)
    log(f"shifted gather     : {t*1e6:8.1f} us/iter -> {2*mb/1e3/t:7.1f} GB/s")

    # pure Pallas copy kernel, 128-row tiles (the block kernel's layout)
    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def pallas_copy(x, tile=128):
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
        log(f"pallas copy T={tile:4d} : {t*1e6:8.1f} us/iter -> "
            f"{2*mb/1e3/t:7.1f} GB/s")

    # Pallas copy + dummy matmul per tile (isolate MXU cost in the pipeline)
    def copymm_kernel(a_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def pallas_copymm(a, x, tile=128):
        return pl.pallas_call(
            copymm_kernel,
            grid=(V // tile,),
            in_specs=[pl.BlockSpec((tile, tile), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tile, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, D), x.dtype),
        )(a, x)

    for tile in (128, 256):
        a = jnp.eye(tile, dtype=jnp.bfloat16)
        t = chain_time(lambda x, aa=a, tl=tile: pallas_copymm(aa, x, tl), v)
        log(f"pallas mm   T={tile:4d} : {t*1e6:8.1f} us/iter -> "
            f"{2*mb/1e3/t:7.1f} GB/s")


if __name__ == "__main__":
    main()
