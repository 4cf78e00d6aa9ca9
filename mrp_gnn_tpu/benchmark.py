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


def bench_train_edge(nodes=8192, feature_dim=2048, attention_dim=64,
                     robots=8, inner=20,
                     paths=("xla_ell", "pallas_ell")) -> list:
    """GRADIENT-direction (fwd+bwd) edges/s of the attention edge block.

    Times jax.grad of a scalar loss of the edge block w.r.t. the values,
    feeding the gradient forward so the chain stays data-dependent — the
    training-rate counterpart of bench_fusion. On the pallas path the
    backward runs the round-3 kernel tier (block-sparse SDDMM + transposed
    SpMM); on xla it is gather + scatter-add math.
    """
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch

    gb = dataclasses.replace(batch_fully_connected(nodes // robots, robots),
                             scene_adj=None, scene_stride=0)
    E = int(np.asarray(gb.n_edges))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(nodes, attention_dim)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nodes, attention_dim)).astype(np.float32))
    v = jnp.asarray(rng.normal(
        size=(nodes, feature_dim)).astype(np.float32)).astype(jnp.bfloat16)

    out = []
    for path in paths:
        impl = path.split("_", 1)[0]
        ops = dispatch.get_ops(impl)

        def body(vv, ops=ops):
            loss = lambda x: jnp.sum(
                default_edge_fusion(ops, "attention", q, k, x, gb)
                .astype(jnp.float32) ** 2)
            return jax.grad(loss)(vv).astype(vv.dtype)

        try:
            sec = time_chained(body, v, inner)
        except Exception as e:
            _log(f"train_edge {path}: failed ({type(e).__name__}: {e})")
            continue
        rec = {"bench": "train_edge", "path": path, "nodes": nodes,
               "edges": E, "feature_dim": feature_dim, "sec_per_call": sec,
               "edges_per_s": E / sec, "backend": jax.default_backend()}
        out.append(rec)
        _log(f"train_edge {path}: {E / sec:,.0f} edges/s "
             f"({sec * 1e6:.0f} us/call)")
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


def _probe_ceilings(inner=30, reps=3):
    """In-run machine ceilings: stream bandwidth (permute chain — a data-
    dependent gather cannot be fused away) and bf16 matmul FLOP rate (big
    square matmul chain). Best of ``reps`` because the axon-tunneled chip
    drifts far below spec AND between runs, with multi-x degraded windows
    (BASELINE.md)."""
    import jax
    import jax.numpy as jnp
    N = 8192
    v = jnp.ones((N, 2048), jnp.bfloat16)
    perm = jnp.asarray(np.random.default_rng(0).permutation(N))

    def stream_chain(v):
        return jax.lax.scan(lambda c, _: (c[perm], ()), v, None,
                            length=inner)[0]

    f = jax.jit(stream_chain)
    jax.block_until_ready(f(v))
    stream = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(v))
        stream = max(stream,
                     2 * N * 2048 * 2 * inner / (time.perf_counter() - t0))

    M = 4096
    a = jnp.ones((M, M), jnp.bfloat16)

    def mm_chain(a):
        return jax.lax.scan(
            lambda c, _: ((c @ c * (1.0 / M)).astype(c.dtype), ()), a, None,
            length=inner)[0]

    g = jax.jit(mm_chain)
    jax.block_until_ready(g(a))
    matmul = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(g(a))
        matmul = max(matmul,
                     2 * M**3 * inner / (time.perf_counter() - t0))
    _log(f"ceilings: stream {stream/1e9:,.1f} GB/s, "
         f"bf16 matmul {matmul/1e12:,.1f} TFLOP/s")
    return stream, matmul


def _cost(compiled) -> tuple:
    """(flops, bytes) from XLA's cost analysis of a compiled program, or
    (None, None) when the backend does not report it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None


def bench_mfu(config_name="five_robot_attention", inner=20,
              encoder_channels=None) -> list:
    """Full-train-step accounting against the MACHINE (BASELINE.json:5
    "speed-of-light", beyond the edge block): per-stage FLOPs + bytes from
    XLA's cost analysis, per-stage wall-clock from data-dependent chains,
    reported as achieved fraction of the IN-RUN measured matmul and stream
    ceilings. The binding ceiling per stage gives a speed-of-light time;
    sol_frac = t_sol / t_measured.

    Chain protocol: every stage feeds ``x + 1e-20 * mean(out)`` forward so
    the chain stays data-dependent (the tunnel returns cached nonsense for
    repeat-identical dispatches) while adding only one scalar reduction of
    the stage output to the measured traffic.
    """
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.config import get_config
    from mrp_gnn_tpu.data.pipeline import make_dataset
    from mrp_gnn_tpu.models.decoder import Decoder, DepthHead, SegHead
    from mrp_gnn_tpu.models.encoder import Encoder
    from mrp_gnn_tpu.models.fusion import GraphFusionLayer
    from mrp_gnn_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step)

    cfg = get_config(config_name)
    if encoder_channels is not None:
        # compute-dense CONTROL (VERDICT r4 weak #2): the same step with a
        # wide-channel encoder, to separate "the framework caps MFU" from
        # "the contract model's thin convs cannot fill the MXU". Wide convs
        # raise arithmetic intensity ~linearly in channel width, so if the
        # framework (dispatch, layout, fusion) were the ceiling, sol_frac
        # would NOT climb with width.
        import dataclasses as _dc
        cfg = cfg.replace(model=_dc.replace(
            cfg.model, encoder_channels=tuple(encoder_channels)))
        config_name = f"{config_name}+ch{'-'.join(map(str, encoder_channels))}"
    mc = cfg.model
    dtype = jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32
    batch = next(iter(make_dataset(cfg.data, "train", shuffle=False)))
    graph = batch["graph"]
    state, model = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    params = state.params["params"]
    images = jnp.asarray(batch["images"])

    stream_bw, matmul_fl = _probe_ceilings()

    def nbytes(tree) -> int:
        return int(sum(np.prod(l.shape) * jnp.dtype(l.dtype).itemsize
                       for l in jax.tree_util.tree_leaves(tree)
                       if hasattr(l, "shape")))

    enc = Encoder(mc.encoder_channels, mc.norm_groups, dtype)
    skips, bottleneck = enc.apply({"params": params["encoder"]},
                                  images.astype(dtype))
    dec_mod = Decoder(mc.encoder_channels, mc.norm_groups, dtype)

    # stage name -> (fn, x0, params subtree for the traffic lower bound)
    stages = {}
    stages["encoder"] = (lambda x: enc.apply({"params": params["encoder"]},
                                             x)[1],
                         images.astype(dtype), params["encoder"])
    if mc.fusion != "none":
        fus = GraphFusionLayer(aggregation=mc.fusion,
                               attention_dim=mc.attention_dim,
                               attention_heads=mc.attention_heads,
                               norm_groups=mc.norm_groups, dtype=dtype,
                               ops_impl=cfg.parallel.ops_impl)
        stages["fusion"] = (lambda x: fus.apply({"params": params["fusion0"]},
                                                x, graph), bottleneck,
                            params["fusion0"])
    fused = (stages["fusion"][0](bottleneck) if mc.fusion != "none"
             else bottleneck)
    stages["decoder"] = (lambda x: dec_mod.apply({"params": params["decoder"]},
                                                 skips, x), fused,
                         (params["decoder"], skips))
    dec_out = stages["decoder"][0](fused)
    heads = []
    head_params = []
    if mc.predict_depth:
        dh = DepthHead(mc.min_depth, mc.max_depth, dtype)
        heads.append(lambda x: dh.apply({"params": params["depth_head"]}, x))
        head_params.append(params["depth_head"])
    if mc.num_seg_classes > 0:
        sh = SegHead(mc.num_seg_classes, dtype)
        heads.append(lambda x: sh.apply({"params": params["seg_head"]}, x))
        head_params.append(params["seg_head"])
    if heads:
        stages["heads"] = (lambda x: sum(jnp.sum(h(x)) for h in heads),
                           dec_out, head_params)

    out = []

    def account(name, sec, flops, logical_bytes, min_bytes):
        """t_sol = the stage's speed-of-light time from the binding ceiling:
        flops vs the probed matmul rate, MIN traffic (inputs + params +
        outputs — a true lower bound; XLA's 'bytes accessed' counts logical
        per-op accesses incl. fused intermediates and can exceed real HBM
        traffic many-fold) vs the probed stream bandwidth."""
        t_mm = flops / matmul_fl if flops else 0.0
        t_st = min_bytes / stream_bw
        t_sol = max(t_mm, t_st, 1e-12)
        rec = {"bench": "mfu", "config": config_name, "stage": name,
               "sec": sec, "flops": flops, "logical_bytes": logical_bytes,
               "min_bytes": min_bytes,
               "achieved_tflops": (flops / sec / 1e12) if flops else None,
               "bound": "matmul" if t_mm >= t_st else "stream",
               "sol_frac": t_sol / sec,
               "stream_ceiling_gbs": stream_bw / 1e9,
               "matmul_ceiling_tflops": matmul_fl / 1e12,
               "backend": jax.default_backend()}
        out.append(rec)
        _log(f"{name:>10}: {sec*1e3:8.2f} ms  {(flops or 0)/1e9:8.2f} GFLOP"
             f" {min_bytes/1e6:8.1f} MB(min) {(logical_bytes or 0)/1e6:8.1f}"
             f" MB(logical)  bound={rec['bound']}  sol={rec['sol_frac']:.2f}")

    for name, (fn, x0, extra) in stages.items():
        def chained(x, fn=fn):
            def body(c, _):
                o = fn(c)
                dep = (jnp.mean(o[1] if isinstance(o, tuple) else o)
                       .astype(jnp.float32))
                return (c + (1e-20 * dep).astype(c.dtype), ())
            return jax.lax.scan(body, x, None, length=inner)[0]

        f = jax.jit(chained)
        flops, bts = _cost(jax.jit(fn).lower(x0).compile())
        out_shape = jax.eval_shape(fn, x0)
        min_bytes = nbytes(x0) + nbytes(extra) + nbytes(out_shape)
        jax.block_until_ready(f(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            best = min(best, (time.perf_counter() - t0) / inner)
        account(name, best, flops, bts, min_bytes)

    # full train step (fwd + bwd + optimizer), chained through the state
    step_fn = make_train_step(cfg, model, make_optimizer(cfg), donate=False)
    args = (images, jnp.asarray(batch["depth"]), jnp.asarray(batch["seg"]),
            graph)
    flops, bts = _cost(jax.jit(step_fn.__wrapped__).lower(state, *args)
                       .compile())
    # min traffic: read params + moments + batch, write params + moments
    # (activations/remat traffic excluded — this is a LOWER bound).
    min_bytes = (2 * nbytes(state.params) + 2 * nbytes(state.opt_state)
                 + nbytes(args))
    s2, _ = step_fn(state, *args)
    jax.block_until_ready(s2.params)
    t0 = time.perf_counter()
    for _ in range(inner):
        s2, _ = step_fn(s2, *args)
    jax.block_until_ready(s2.params)
    account("train_step", (time.perf_counter() - t0) / inner, flops, bts,
            min_bytes)
    return out


def _scaling_graph(topology, scenes, robots, comm_radius=4):
    from mrp_gnn_tpu.graph import batch_homogeneous, scene_edges_for
    return batch_homogeneous(
        scenes, robots, scene_edges_for(robots, topology, comm_radius))


def _weak_scaling_batch(topology, P, robots, scenes_per_shard):
    """Graph for the P-shard point of the weak-scaling sweep.

    full:   scenes_per_shard*P dense scenes of `robots` (boundary-heavy:
            scenes straddle shards whenever robots > nodes-per-shard).
    radius: ONE growing swarm of 128*P robots, comm radius 4 — per-shard
            nodes/edges constant, the swarm spans every shard, and the
            boundary set per shard is a constant halo (the honest setting
            for the boundary-proportional exchange; scene-aligned layouts
            would carry zero boundary edges).
    """
    if topology == "radius":
        return _scaling_graph("radius", 1, 128 * P)
    return _scaling_graph("full", scenes_per_shard * P, robots)


def bench_scaling(max_devices=None, robots=8, scenes_per_shard=16,
                  feature_dim=2048, inner=30, topology="full",
                  exchange="boundary") -> list:
    """Weak-scaling efficiency of the partitioned fusion over the graph axis.

    Per-shard work is held constant; efficiency(P) =
    edges/s(P) / (P * edges/s(1)). topology: "full" (dense swarms — most
    edges boundary) or "radius" (sparse — boundary-proportional exchange
    shines). exchange: "boundary" | "all_gather" (the A/B of
    BASELINE.json:5). On CPU this exercises the code path; real numbers
    need a pod slice (BASELINE.md measurement protocol).
    """
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.mesh import make_mesh
    from mrp_gnn_tpu.parallel.partition import (boundary_fraction,
                                                exchange_rows,
                                                partition_graph)

    ndev = max_devices or jax.device_count()
    ops = dispatch.get_ops("xla")
    out = []
    base = None
    P = 1
    while P <= ndev:
        gb = _weak_scaling_batch(topology, P, robots, scenes_per_shard)
        V = gb.max_nodes
        E = int(np.asarray(gb.n_edges))
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(V, feature_dim)).astype(np.float32))

        extras = {}
        if P == 1:
            def body(v, gb=gb):
                return default_edge_fusion(ops, "attention", q, k, v, gb) * 0.5 + v * 0.5
        else:
            mesh = make_mesh(1, P)
            plan = partition_graph(gb, P)
            edge_fn = make_partitioned_edge_fusion(mesh, plan,
                                                   exchange=exchange)
            extras = {"boundary_fraction": round(boundary_fraction(plan), 4),
                      "recv_rows_per_shard": exchange_rows(plan)[
                          "boundary" if exchange == "boundary"
                          else "all_gather"]}

            def body(v, gb=gb, edge_fn=edge_fn):
                return edge_fn(ops, "attention", q, k, v, gb) * 0.5 + v * 0.5

        sec = time_chained(body, v, inner)
        eps = E / sec
        if base is None:
            base = eps
        eff = eps / (base * P)
        rec = {"bench": "scaling", "devices": P, "edges": E,
               "topology": topology, "exchange": exchange,
               "edges_per_s": eps, "efficiency": eff,
               "backend": jax.default_backend(), **extras}
        out.append(rec)
        _log(f"P={P} [{topology}/{exchange}]: {eps:,.0f} edges/s, "
             f"weak-scaling eff {eff:.2%} {extras}")
        P *= 2
    return out


def hlo_overlap_window(txt: str) -> dict:
    """Overlap window of the boundary exchange in a scheduled HLO module.

    Finds the LARGEST collective(s) in the ENTRY schedule (the value
    exchange; the key exchange is ~D/dk smaller), then counts how many
    scheduled instructions sit between their issue point and the first
    instruction consuming their results — the work available to hide the
    ICI transfer behind. Works on both sync `collective-permute` (CPU, and
    TPU's scheduled text form) and async -start/-done pairs.
    """
    import re
    entry = txt[txt.index("ENTRY "):] if "ENTRY " in txt else txt
    lines = [l for l in entry.splitlines() if re.match(r"\s+(ROOT )?%", l)]
    colls = []  # (sched_idx, name, elem_count, is_start)
    for i, l in enumerate(lines):
        if "collective-permute" not in l and "all-to-all" not in l:
            continue
        if "-done" in l:
            continue  # paired with its start below
        m = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = \(?(\w+)\[([\d,]*)\]", l)
        if not m:
            continue
        size = np.prod([int(x) for x in m.group(3).split(",") if x] or [1])
        colls.append((i, m.group(1), int(size), "-start" in l))
    if not colls:
        return {"n_collectives": 0, "overlap_window_ops": 0,
                "schedule_len": len(lines)}
    biggest = max(c[2] for c in colls)
    value_colls = [c for c in colls if c[2] == biggest]
    issue = max(c[0] for c in value_colls)
    names = {c[1] for c in value_colls}
    is_async = any(c[3] for c in value_colls)
    # stall point: the -done op (async) or the first consumer (sync)
    consumer = len(lines) - 1
    for i, l in enumerate(lines):
        if i <= issue:
            continue
        rhs = l.split("=", 1)[1] if "=" in l else l
        if any(f"%{n}" in rhs for n in names):
            consumer = i
            break
    return {"n_collectives": len(colls),
            "async_pairs": is_async,
            "value_collective_issue_idx": issue,
            "value_stall_idx": consumer,
            "overlap_window_ops": consumer - issue - 1,
            "schedule_len": len(lines)}


def bench_overlap(devices=None, feature_dim=4096,
                  inner=30, topology="radius") -> list:
    """Overlap evidence for the boundary exchange (BASELINE.json:5).

    Two artifacts per run:
    1. HLO schedule check: in the compiled partitioned step, the value
       collective's -start op must be issued BEFORE the local-partial
       aggregation ops and its -done consumed after (async overlap window).
    2. A/B timing: overlap=True vs overlap=False (serialized via
       optimization_barrier) on the same mesh/graph.
    """
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.mesh import make_mesh
    from mrp_gnn_tpu.parallel.partition import partition_graph

    ndev = devices or jax.device_count()
    ops = dispatch.get_ops("xla")
    gb = _weak_scaling_batch(topology, ndev, 8, 2)
    V = gb.max_nodes
    E = int(np.asarray(gb.n_edges))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, feature_dim)).astype(np.float32))
    mesh = make_mesh(1, ndev)
    plan = partition_graph(gb, ndev)

    out = []
    timings = {}
    for overlap in (True, False):
        edge_fn = make_partitioned_edge_fusion(mesh, plan, overlap=overlap)

        def one(v, edge_fn=edge_fn):
            return edge_fn(ops, "attention", q, k, v, gb) * 0.5 + v * 0.5

        # --- HLO schedule evidence -----------------------------------------
        hlo_info = hlo_overlap_window(jax.jit(one).lower(v).compile().as_text())
        sec = time_chained(one, v, inner)
        timings[overlap] = sec
        rec = {"bench": "overlap", "overlap": overlap, "devices": ndev,
               "topology": topology, "edges": E, "feature_dim": feature_dim,
               "sec_per_call": sec, "edges_per_s": E / sec,
               "backend": jax.default_backend(), **hlo_info}
        out.append(rec)
        _log(f"overlap={overlap}: {sec * 1e6:.0f} us/call, "
             f"window ops: {hlo_info.get('overlap_window_ops')}")
    if True in timings and False in timings:
        gain = timings[False] / timings[True] - 1.0
        _log(f"overlap speedup vs serialized: {gain:+.2%}")
        out.append({"bench": "overlap_summary", "devices": ndev,
                    "speedup_vs_serialized": gain})
    return out


def main(argv=None):
    from mrp_gnn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--what", default="fusion",
                   choices=["fusion", "train", "train_edge", "mfu",
                            "scaling", "overlap", "all"])
    p.add_argument("--topology", default="full", choices=["full", "radius"])
    p.add_argument("--exchange", default="boundary",
                   choices=["boundary", "all_gather"])
    p.add_argument("--nodes", type=int, default=8192)
    p.add_argument("--feature_dim", type=int, default=2048)
    p.add_argument("--config", default="five_robot_attention")
    p.add_argument("--encoder_channels", default=None,
                   help="comma-separated override for the encoder channel "
                        "stack (mfu compute-dense control, e.g. 128,256,512)")
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
        if args.what in ("train_edge", "all"):
            recs += bench_train_edge(args.nodes, args.feature_dim,
                                     inner=max(args.inner // 2, 10))
        if args.what in ("mfu", "all"):
            ch = (tuple(int(c) for c in args.encoder_channels.split(","))
                  if args.encoder_channels else None)
            recs += bench_mfu(args.config,
                              inner=max(args.inner // 2, 10),
                              encoder_channels=ch)
        if args.what in ("scaling", "all"):
            recs += bench_scaling(inner=args.inner, topology=args.topology,
                                  exchange=args.exchange)
        if args.what in ("overlap", "all"):
            recs += bench_overlap(inner=args.inner, topology=args.topology)
    for r in recs:
        line = json.dumps(r)
        print(line)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
