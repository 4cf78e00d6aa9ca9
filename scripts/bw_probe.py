"""Probe: what HBM bandwidth do chained XLA / Pallas ops actually achieve?

Distinguishes "the attention kernels are slow" from "any chained op tops
out at X GB/s on this chip". All chains: 50 serial iterations over a
[8192, 2048] bf16 buffer (33.5 MB), read+write = 67 MB/iter.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, D, ITERS = 8192, 2048, 50
BYTES = 2 * V * D * 2  # read + write, bf16


def timed(chained, v):
    fn = jax.jit(chained)
    jax.block_until_ready(fn(v))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"  {per*1e6:8.1f} us/iter  {BYTES/per/1e9:7.1f} GB/s")
    return per


def chain(f):
    def chained(v):
        return jax.lax.scan(lambda c, _: (f(c), ()), v, None, length=ITERS)[0]
    return chained


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def scale_kernel(x_ref, o_ref):
    o_ref[:] = (x_ref[:].astype(jnp.float32) * 1.0001).astype(o_ref.dtype)


def pallas_map(kernel, T, F):
    def f(v):
        return pl.pallas_call(
            kernel,
            grid=(V // T, D // F),
            in_specs=[pl.BlockSpec((T, F), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, F), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, D), jnp.bfloat16),
        )(v)
    return f


def main():
    print(f"devices={jax.devices()}", file=sys.stderr)
    v = jnp.ones((V, D), jnp.bfloat16)
    perm = jnp.asarray(np.random.default_rng(0).permutation(V))

    print("xla scale (v*1.0001):")
    timed(chain(lambda c: (c.astype(jnp.float32) * 1.0001
                           ).astype(jnp.bfloat16)), v)
    print("xla row-permute gather:")
    timed(chain(lambda c: c[perm]), v)
    print("pallas copy T=512 F=2048:")
    timed(chain(pallas_map(copy_kernel, 512, 2048)), v)
    print("pallas copy T=256 F=1024:")
    timed(chain(pallas_map(copy_kernel, 256, 1024)), v)
    print("pallas copy T=128 F=1024:")
    timed(chain(pallas_map(copy_kernel, 128, 1024)), v)
    print("pallas scale T=256 F=1024:")
    timed(chain(pallas_map(scale_kernel, 256, 1024)), v)


if __name__ == "__main__":
    main()
