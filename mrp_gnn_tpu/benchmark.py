"""Benchmark harness: fusion edges/s, train-step throughput, scaling efficiency.

Measures the contract metrics (BASELINE.json:2): edges/s/chip for the GNN
fusion layer per ops path, end-to-end train-step time, and weak-scaling
efficiency of the partitioned fusion over mesh sizes. Emits JSONL records.

Platform note: the axon TPU tunnel adds ~250-300us fixed overhead per
dispatched program; timings chain `inner` applications inside one jitted
lax.scan so the steady-state op time dominates. Use --inner to adjust.

CLI:
  python -m mrp_gnn_tpu.benchmark --what fusion --nodes 8192
  python -m mrp_gnn_tpu.benchmark --what train --config five_robot_attention
  python -m mrp_gnn_tpu.benchmark --what scaling   # on >=8 devices (or CPU sim)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_chained(fn_body, init, inner: int, reps: int = 3):
    """Steady-state seconds per application of fn_body, scan-chained."""
    import jax

    def chained(x):
        return jax.lax.scan(lambda c, _: (fn_body(c), ()), x, None,
                            length=inner)[0]

    f = jax.jit(chained)
    jax.block_until_ready(f(init))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def bench_fusion(nodes=8192, feature_dim=2048, attention_dim=64,
                 robots=8, inner=50,
                 paths=("xla_scatter", "xla_ell", "pallas_ell",
                        "xla_block", "pallas_block")) -> list:
    """edges/s of the attention edge block per ops path.

    Paths: *_block = dense block-diagonal (MXU); *_ell = padded neighbour
    list (gather, no scatter); xla_scatter = naive edge-list
    gather/scatter-add baseline.
    """
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch

    gb_block = batch_fully_connected(nodes // robots, robots)
    gb_ell = dataclasses.replace(gb_block, scene_adj=None, scene_stride=0)
    gb_scatter = dataclasses.replace(gb_ell, ell_src=None, ell_mask=None)
    E = int(np.asarray(gb_block.n_edges))

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(nodes, attention_dim)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nodes, attention_dim)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(nodes, feature_dim)).astype(np.float32))

    out = []
    graphs = {"scatter": gb_scatter, "ell": gb_ell, "block": gb_block}
    for path in paths:
        name = path
        bf16 = path.endswith("_bf16")
        if bf16:
            path = path[: -len("_bf16")]
        impl, kind = path.split("_", 1)
        gb = graphs[kind]
        ops = dispatch.get_ops(impl)
        vv = v.astype(jnp.bfloat16) if bf16 else v

        def body(v, ops=ops, gb=gb):
            # attention output is a convex combination of values -> bounded;
            # feeding it straight back keeps the chain data-dependent without
            # adding extra memory traffic to the measurement.
            return default_edge_fusion(ops, "attention", q, k, v, gb).astype(v.dtype)

        try:
            sec = time_chained(body, vv, inner)
        except Exception as e:
            _log(f"{name}: failed ({type(e).__name__}: {e})")
            continue
        path = name
        rec = {"bench": "fusion", "path": path, "nodes": nodes, "edges": E,
               "feature_dim": feature_dim, "sec_per_call": sec,
               "edges_per_s": E / sec, "backend": jax.default_backend()}
        out.append(rec)
        _log(f"{path}: {E / sec:,.0f} edges/s ({sec * 1e6:.0f} us/call)")
    return out


def bench_train(config_name="five_robot_attention", inner=20) -> list:
    """End-to-end jitted train-step time for a preset config."""
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.config import get_config
    from mrp_gnn_tpu.data.pipeline import make_dataset
    from mrp_gnn_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step)

    cfg = get_config(config_name)
    batch = next(iter(make_dataset(cfg.data, "train", shuffle=False)))
    state, model = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = make_train_step(cfg, model, make_optimizer(cfg), donate=False)
    args = (jnp.asarray(batch["images"]), jnp.asarray(batch["depth"]),
            jnp.asarray(batch["seg"]), batch["graph"])

    # warm/compile
    state2, _ = step_fn(state, *args)
    jax.block_until_ready(state2.params)
    t0 = time.perf_counter()
    for _ in range(inner):
        state2, terms = step_fn(state2, *args)
    jax.block_until_ready(state2.params)
    sec = (time.perf_counter() - t0) / inner

    E = int(np.asarray(batch["graph"].n_edges))
    V = int(np.asarray(batch["graph"].n_nodes))
    rec = {"bench": "train_step", "config": config_name, "sec_per_step": sec,
           "steps_per_s": 1 / sec, "nodes_per_s": V / sec,
           "edges_per_s": E / sec, "backend": jax.default_backend()}
    _log(f"train[{config_name}]: {sec * 1e3:.2f} ms/step")
    return [rec]


def bench_scaling(max_devices=None, robots=8, scenes_per_shard=16,
                  feature_dim=2048, inner=30) -> list:
    """Weak-scaling efficiency of the partitioned fusion over the graph axis.

    Per-shard work is held constant; efficiency(P) =
    edges/s(P) / (P * edges/s(1)). On CPU this exercises the code path;
    real numbers need a pod slice (BASELINE.md measurement protocol).
    """
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.mesh import make_mesh
    from mrp_gnn_tpu.parallel.partition import partition_graph

    ndev = max_devices or jax.device_count()
    ops = dispatch.get_ops("xla")
    out = []
    base = None
    P = 1
    while P <= ndev:
        scenes = scenes_per_shard * P
        gb = batch_fully_connected(scenes, robots)
        V = gb.max_nodes
        E = int(np.asarray(gb.n_edges))
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(V, feature_dim)).astype(np.float32))

        if P == 1:
            def body(v, gb=gb):
                return default_edge_fusion(ops, "attention", q, k, v, gb) * 0.5 + v * 0.5
        else:
            mesh = make_mesh(1, P)
            plan = partition_graph(gb, P)
            edge_fn = make_partitioned_edge_fusion(mesh, plan)

            def body(v, gb=gb, edge_fn=edge_fn):
                return edge_fn(ops, "attention", q, k, v, gb) * 0.5 + v * 0.5

        sec = time_chained(body, v, inner)
        eps = E / sec
        if base is None:
            base = eps
        eff = eps / (base * P)
        rec = {"bench": "scaling", "devices": P, "edges": E,
               "edges_per_s": eps, "efficiency": eff,
               "backend": jax.default_backend()}
        out.append(rec)
        _log(f"P={P}: {eps:,.0f} edges/s, weak-scaling eff {eff:.2%}")
        P *= 2
    return out


def main(argv=None):
    from mrp_gnn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--what", default="fusion",
                   choices=["fusion", "train", "scaling", "all"])
    p.add_argument("--nodes", type=int, default=8192)
    p.add_argument("--feature_dim", type=int, default=2048)
    p.add_argument("--config", default="five_robot_attention")
    p.add_argument("--inner", type=int, default=50)
    p.add_argument("--out", default=None, help="append JSONL to this file")
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace into this directory")
    args = p.parse_args(argv)

    recs = []
    if args.profile:
        from mrp_gnn_tpu.utils.profiling import trace
        import contextlib
        ctx = trace(args.profile)
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        if args.what in ("fusion", "all"):
            recs += bench_fusion(args.nodes, args.feature_dim, inner=args.inner)
        if args.what in ("train", "all"):
            recs += bench_train(args.config)
        if args.what in ("scaling", "all"):
            recs += bench_scaling(inner=args.inner)
    for r in recs:
        line = json.dumps(r)
        print(line)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
