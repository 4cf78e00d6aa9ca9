"""Chip A/B for the high-degree row-expanded kernel path (docs/kernels.md
"Degree cap and the designed extension", implemented round 4).

Validates on the real TPU (interpret mode cannot catch Mosaic tiling
constraints) and measures where the expanded-kernel path beats the XLA
gather league for ELL widths past the 128-column unroll cap:

1. correctness gate: expanded_attention values (swarm scale) and grads
   (reduced scale — the XLA ORACLE's backward OOMs HBM at swarm scale:
   24.4 G needed vs 15.75 G, itself a datapoint) vs the XLA ELL oracle;
2. throughput A/B: scan-chained forward at swarm scale, both paths; the
   training direction for the expanded path, with the gather league's
   compile attempt recorded (OOM on this chip).

Timing protocol per .claude/skills/verify: data-dependent scan chains only
(single-dispatch timing over the axon tunnel is meaningless).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _graph(n_robots, scenes):
    from mrp_gnn_tpu.graph import batch_homogeneous, fully_connected_edges
    V = ((n_robots * scenes + 127) // 128) * 128
    return batch_homogeneous(scenes, n_robots,
                             fully_connected_edges(n_robots), max_nodes=V)


def _rand(V, D, dk, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(V, dk)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)))


def _oracle(gb, dk):
    import jax.numpy as jnp
    from mrp_gnn_tpu.ops import reference as R

    def oracle(q, k, v):
        logits = R.ell_sddmm(q, k, gb.ell_src, gb.ell_mask) / np.sqrt(dk)
        alpha = R.ell_softmax(logits, gb.ell_mask)
        return R.ell_aggregate(alpha, v, gb.ell_src, gb.ell_mask, "sum")

    return oracle


def check(n_robots, scenes, D=512, dk=64):
    """Values + grads vs the XLA oracle at a scale the oracle can compile."""
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.ops import pallas_bsp as B

    gb = _graph(n_robots, scenes)
    V, deg = gb.ell_src.shape
    assert B.supports_expanded(gb) and not B.supports(gb)
    q, k, v = _rand(V, D, dk)
    oracle = _oracle(gb, dk)
    got1 = jax.jit(B.expanded_attention_fused)(q, k, v, gb)
    got = jax.jit(B.expanded_attention)(q, k, v, gb)
    want = jax.jit(oracle)(q, k, v)
    err = float(jnp.max(jnp.abs(got - want)))
    err1 = float(jnp.max(jnp.abs(got1 - want)))
    scale = float(jnp.max(jnp.abs(want)))
    assert err < 1e-3 * max(scale, 1.0), f"fwd mismatch {err} ({scale})"
    assert err1 < 1e-3 * max(scale, 1.0), f"one-pass mismatch {err1}"
    g_got = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            B.expanded_attention_fused(q, k, v, gb) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    g_want = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(oracle(q, k, v) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("q k v".split(), g_got, g_want):
        e = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b)))
        assert e < 1e-3 * max(s, 1.0), f"d{name} mismatch {e} ({s})"
    log(f"deg-{deg} V={V} chip correctness: fwd_err={err:.2e} OK "
        f"(values+grads)")


def ab(n_robots, scenes, D=2048, dk=64, iters=20):
    """Swarm-scale forward value check + throughput A/B + train direction."""
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.ops import pallas_bsp as B

    gb = _graph(n_robots, scenes)
    V, deg = gb.ell_src.shape
    E = int(np.asarray(gb.n_edges))
    xp = gb.bsp_expanded
    log(f"graph: {scenes}x{n_robots} robots V={V} E={E} deg={deg} "
        f"expanded rows={xp.rows} width={xp.width} "
        f"pairs={int(xp.pair_dst.shape[0])}")
    q, k, v32 = _rand(V, D, dk)
    oracle = _oracle(gb, dk)

    # The code under test must fail LOUDLY at this scale; only the oracle
    # (whose gather form can exceed HBM) is allowed to drop out.
    got = jax.jit(B.expanded_attention)(q, k, v32, gb)
    try:
        want = jax.jit(oracle)(q, k, v32)
    except Exception as e:
        # correctness is already gated at V=1024 above.
        log(f"deg-{deg} swarm-scale oracle does not fit on chip "
            f"({type(e).__name__}); correctness gated at reduced scale")
    else:
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want)))
        assert err < 1e-3 * max(scale, 1.0), f"fwd mismatch {err} ({scale})"
        log(f"deg-{deg} swarm-scale forward check OK (err {err:.2e})")

    v = v32.astype(jnp.bfloat16)
    xla = dispatch.get_ops("xla")

    def chain(f):
        def chained(q, k, v):
            return jax.lax.scan(
                lambda c, _: (f(q, k, c).astype(c.dtype), ()), v, None,
                length=iters)[0]
        fn = jax.jit(chained)
        jax.block_until_ready(fn(q, k, v))

        def timed():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, k, v))
            return time.perf_counter() - t0
        return timed

    def train_fn(f):
        def link(q, k, c):
            loss = lambda vv: jnp.sum(
                f(q, k, vv).astype(jnp.float32) ** 2)
            return jax.grad(loss)(c).astype(c.dtype)
        return lambda q, k, c: link(q, k, c)

    def rate(maker, tag):
        """edges/s of the best of 3 chained reps, or None when the path
        cannot even COMPILE at this scale (the gather league materializes
        [V*deg, D] and exceeds HBM at deg-192 swarm scale — that OOM is
        itself the result)."""
        try:
            t = chain(maker)
        except Exception as e:
            msg = str(e)
            kind = ("HBM OOM" if "memory space hbm" in msg
                    or "Ran out of memory" in msg else f"{msg[:120]}")
            log(f"deg-{deg} {tag}: failed at V={V} E={E} "
                f"({type(e).__name__}: {kind})")
            return None
        return E * iters / min(t() for _ in range(3))

    # one-pass = the dispatch path; two-kernel kept as the explicit-alpha
    # control (and the backward's math)
    ex1 = rate(lambda q, k, c: B.expanded_attention_fused(q, k, c, gb),
               "expanded one-pass fwd")
    ex2 = rate(lambda q, k, c: B.expanded_attention(q, k, c, gb),
               "expanded two-kernel fwd")
    eg = rate(lambda q, k, c: xla.ell_attention(q, k, c, gb),
              "xla-gather fwd")
    ext = rate(train_fn(
        lambda q, k, c: B.expanded_attention_fused(q, k, c, gb)),
        "expanded train")
    egt = rate(train_fn(lambda q, k, c: xla.ell_attention(q, k, c, gb)),
               "xla-gather train")

    def fmt(x):
        return f"{x/1e6:,.1f}M" if x else "OOM"

    log(f"deg-{deg} V={V}: fwd one-pass {fmt(ex1)} / two-kernel {fmt(ex2)}"
        f" vs xla-gather {fmt(eg)}"
        + (f" ({ex1/eg:.2f}x)" if ex1 and eg else "")
        + f"; train expanded {fmt(ext)} vs {fmt(egt)}"
        + (f" ({ext/egt:.2f}x)" if ext and egt else ""))
    return {"deg": deg, "V": V, "E": E, "fwd_one_pass": ex1,
            "fwd_two_kernel": ex2, "fwd_xla": eg,
            "train_expanded": ext, "train_xla": egt}


def main():
    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    check(193, 5)    # deg 192, V=1024
    check(256, 4)    # deg 255, V=1024
    results = [ab(193, 42), ab(256, 32)]
    for r in results:
        print({k: (round(v, 1) if isinstance(v, float) else v)
               for k, v in r.items()})


if __name__ == "__main__":
    main()
