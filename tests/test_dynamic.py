"""Dynamic swarm topology (DataConfig.mobility > 0): per-batch graphs under
static capacities — shapes stable, topology varying, training end-to-end."""

import dataclasses

import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.data.pipeline import augment_scene, make_dataset
from mrp_gnn_tpu.graph import positions_radius_edges


def _tiny_cfg(**data_kw):
    cfg = get_config("dynamic_swarm")
    data_kw = {"scenes_per_batch": 2, "num_train_scenes": 6,
               "num_eval_scenes": 2, "image_size": (16, 16), **data_kw}
    return cfg.replace(
        model=dataclasses.replace(cfg.model, image_size=(16, 16),
                                  encoder_channels=(8, 16)),
        data=dataclasses.replace(cfg.data, **data_kw),
    )


def test_dynamic_stream_static_shapes_varying_topology():
    cfg = _tiny_cfg()
    it = make_dataset(cfg.data, "train", shuffle=False)
    edges, shapes = [], set()
    for b in it:
        g = b["graph"]
        edges.append(int(np.asarray(g.n_edges)))
        shapes.add((np.asarray(g.edge_src).shape, np.asarray(g.ell_src).shape,
                    np.asarray(g.bsp_pair_dst).shape))
    assert len(shapes) == 1, shapes          # one jit compile for the stream
    assert len(set(edges)) > 1, edges        # topology genuinely varies


def test_dynamic_graph_matches_scene_positions():
    cfg = _tiny_cfg()
    ds_it = make_dataset(cfg.data, "train", shuffle=False)
    batch = next(iter(ds_it))
    g = batch["graph"]
    ds = ds_it.ds
    spacing = ds.spec.max_baseline / max(cfg.data.num_robots - 1, 1)
    N = cfg.data.num_robots
    # rebuild the expected edge set from the records' positions
    want_src, want_dst = [], []
    for s, idx in enumerate(range(cfg.data.scenes_per_batch)):
        pos = ds[idx]["positions"] / spacing
        e = positions_radius_edges(pos.astype(np.float64),
                                   cfg.data.comm_radius)
        want_src.append(e[0] + s * N)
        want_dst.append(e[1] + s * N)
    want = set(zip(np.concatenate(want_src).tolist(),
                   np.concatenate(want_dst).tolist()))
    m = np.asarray(g.edge_mask)
    got = set(zip(np.asarray(g.edge_src)[m].tolist(),
                  np.asarray(g.edge_dst)[m].tolist()))
    assert got == want


def test_augment_flip_preserves_dynamic_topology():
    cfg = _tiny_cfg()
    ds = make_dataset(cfg.data, "train", shuffle=False).ds
    rec = ds[0]
    rng = np.random.default_rng(2)  # first uniform() < 0.5 -> flip fires
    assert np.random.default_rng(2).uniform() < 0.5
    out = augment_scene(rec, rng)
    d_in = np.abs(rec["positions"][:, None] - rec["positions"][None, :])
    d_out = np.abs(out["positions"][:, None] - out["positions"][None, :])
    np.testing.assert_allclose(d_out, d_in[::-1, ::-1], atol=1e-6)


def test_dynamic_mobility_validation():
    cfg = _tiny_cfg(connectivity="full", comm_radius=0)
    with pytest.raises(ValueError, match="radius"):
        make_dataset(cfg.data, "train")


@pytest.mark.slow
def test_dynamic_train_short_run():
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, steps=6, log_every=3, eval_every=0, checkpoint_every=0))
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 6


def test_dynamic_grad_accum_trains():
    """Round 3: dynamic topology composes with gradient accumulation — the
    stacker stacks per-microbatch graphs (capacity-pinned shapes) and the
    train step scans over them, each microbatch aggregating under its own
    topology."""
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, steps=4, log_every=2, eval_every=0, checkpoint_every=0,
        grad_accum_steps=2))
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 4


def test_dynamic_grad_accum_matches_manual_average():
    """A stacked-graph accumulation step must equal the average of the two
    single-microbatch gradients applied as one update: run 1 accum=2 step
    and compare the resulting loss trace start against accum=1 on the same
    stream consumed pairwise (smoke-level: first-step losses must agree,
    since both see identical params and the loss is the mean over the
    microbatch pair)."""
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg()
    base = dataclasses.replace(cfg.train, steps=1, log_every=1,
                               eval_every=0, checkpoint_every=0)
    cfg_acc = cfg.replace(train=dataclasses.replace(base,
                                                    grad_accum_steps=2))
    _, recs_acc = train(cfg_acc)
    loss_acc = recs_acc[0]["total"]
    # manual: average the per-microbatch losses of the same first 2 batches
    from mrp_gnn_tpu.data.pipeline import make_train_iterator
    import jax.numpy as jnp
    from mrp_gnn_tpu.losses import total_loss
    from mrp_gnn_tpu.models import MultiRobotPerceptionNet
    from mrp_gnn_tpu.train import create_train_state
    import jax
    it = make_train_iterator(cfg.data)
    b0, b1 = next(it), next(it)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state, model = create_train_state(cfg, rng, b0)
    losses = []
    for b in (b0, b1):
        out = model.apply(state.params, jnp.asarray(b["images"]), b["graph"])
        loss, _ = total_loss(out, {"depth": b["depth"], "seg": b["seg"]},
                             b["graph"].node_mask,
                             cfg.train.depth_loss_weight,
                             cfg.train.seg_loss_weight,
                             depth_loss=cfg.train.depth_loss)
        losses.append(float(loss))
    want = float(np.mean(losses))
    np.testing.assert_allclose(loss_acc, want, rtol=1e-4)


def test_dynamic_grain_loader_trains():
    """Round 3: the grain loader supports dynamic topology — per-batch
    graphs built from collated robot positions after the worker boundary."""
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, loader="grain",
                                 loader_workers=0),
        train=dataclasses.replace(cfg.train, steps=4, log_every=2,
                                  eval_every=0, checkpoint_every=0))
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 4


def test_dynamic_grain_yields_varying_graphs():
    from mrp_gnn_tpu.data.grain_pipeline import make_grain_iterator
    cfg = dataclasses.replace(_tiny_cfg().data, loader_workers=0)
    it = make_grain_iterator(cfg, "train", shuffle=False)
    b0, b1 = next(it), next(it)
    e0, e1 = int(np.asarray(b0["graph"].n_edges)), int(
        np.asarray(b1["graph"].n_edges))
    # same static shapes, different topology content
    assert b0["graph"].edge_src.shape == b1["graph"].edge_src.shape
    assert (e0 != e1
            or not np.array_equal(np.asarray(b0["graph"].ell_src),
                                  np.asarray(b1["graph"].ell_src)))


# --- dynamic topology + graph partitioning ----------------------------------


def _dyn_positions(S, N, seed):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, N - 1, N).astype(np.float64)
    return [base + rng.uniform(-1.5, 1.5, N) for _ in range(S)]


def _dyn_graph(seed, S=4, N=32):
    from mrp_gnn_tpu.graph import batch_from_positions
    return batch_from_positions(_dyn_positions(S, N, seed), radius=4.0,
                                max_nodes=S * N, max_edges=S * N * (N - 1),
                                max_degree=N - 1)


def _dyn_partitioned_setup(data_ax, graph_ax, S=4, N=32):
    from mrp_gnn_tpu.graph import batch_fully_connected
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.mesh import make_mesh
    from mrp_gnn_tpu.parallel.partition import capacities_of, partition_graph
    v_rep = S * N // data_ax
    full = batch_fully_connected(S // data_ax, N, max_nodes=v_rep)
    cap_plan = partition_graph(full, graph_ax)
    caps = capacities_of(cap_plan)
    mesh = make_mesh(data_ax, graph_ax)
    edge_fn = make_partitioned_edge_fusion(mesh, cap_plan, dynamic=True)
    return caps, edge_fn


def test_dynamic_partitioned_matches_unpartitioned():
    """Per-batch plans under shared capacities: partitioned == unpartitioned
    (values AND grads), and a second topology reuses the same shapes."""
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.partition import partition_batch

    OPS = dispatch.get_ops("xla")
    data_ax, graph_ax, S, N = 2, 4, 4, 32
    caps, edge_fn = _dyn_partitioned_setup(data_ax, graph_ax, S, N)

    rng = np.random.default_rng(0)
    V = S * N
    q = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, 12)).astype(np.float32))

    run = jax.jit(lambda q, k, v, g: edge_fn(OPS, "attention", q, k, v, g))
    shapes = set()
    for seed in (0, 1):
        g = _dyn_graph(seed, S, N)
        plan = partition_batch(g, data_ax, graph_ax, caps)
        g = dataclasses.replace(g, partition_plan=plan)
        shapes.add(tuple(np.asarray(x).shape for x in
                         (plan.send_idx, plan.ell_src, plan.remote_dst)))
        got = run(q, k, v, g)
        # no cross-replica edges => whole-batch unpartitioned run is the
        # concatenation of per-replica oracles
        want = default_edge_fusion(OPS, "attention", q, k, v, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        g_part = jax.grad(lambda q, k, v: jnp.sum(run(q, k, v, g) ** 2),
                          argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: jnp.sum(
                default_edge_fusion(OPS, "attention", q, k, v, g) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_part, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
    assert len(shapes) == 1, shapes


def test_dynamic_partitioned_high_degree_expanded_optin():
    """Round 5 composition corner: DYNAMIC topology x edge partitioning x
    >128 local degree. With PlanCapacities.xp_pairs opted in, per-batch
    plans carry stacked per-shard expanded arrays with batch-invariant
    shapes, and the partitioned fusion matches the unpartitioned oracle
    (values + grads) across differing topologies."""
    import jax
    import jax.numpy as jnp
    from mrp_gnn_tpu.graph import batch_from_positions, batch_fully_connected
    from mrp_gnn_tpu.models.fusion import default_edge_fusion
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.mesh import make_mesh
    from mrp_gnn_tpu.parallel.partition import (capacities_of,
                                                partition_batch,
                                                partition_graph)

    OPS = dispatch.get_ops("xla")
    S, N = 2, 160                       # 2 shards of 160 nodes (> 128)
    V = S * N
    full = batch_fully_connected(S, N, max_nodes=V)
    cap_plan = partition_graph(full, 2)  # static: xp auto-built
    assert cap_plan.xp_pair_dst is not None and cap_plan.xp_rows == 2
    n_xp = int(cap_plan.xp_pair_dst.shape[-1])
    caps = dataclasses.replace(capacities_of(cap_plan),
                               xp_pairs=n_xp + 64)  # family headroom
    # cap_plan's xp length differs from caps.xp_pairs; only rows/width are
    # compiled in, so rebuild the capacity plan under the same caps.
    mesh = make_mesh(1, 2)
    edge_fn = make_partitioned_edge_fusion(mesh, cap_plan, dynamic=True)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(V, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, 12)).astype(np.float32))
    run = jax.jit(lambda q, k, v, g: edge_fn(OPS, "attention", q, k, v, g))
    shapes = set()
    import warnings as _w

    def _build(seed):
        # suppress the GRAPH-level fallback warning: the graph's own BSP
        # plan is unused here (the partition plan carries the xp opt-in)
        with _w.catch_warnings():
            _w.simplefilter("ignore", UserWarning)
            return batch_from_positions(_dyn_positions(S, N, seed),
                                        radius=80.0, max_nodes=V,
                                        max_edges=S * N * (N - 1),
                                        max_degree=N - 1)

    for seed in (0, 1):
        g = _build(seed)
        assert g.ell_src.shape[1] > 128
        plan = partition_batch(g, 1, 2, caps)
        assert plan.xp_pair_dst is not None
        assert plan.xp_pair_dst.shape == (2, n_xp + 64)
        assert (plan.xp_rows, plan.xp_width) == (cap_plan.xp_rows,
                                                 cap_plan.xp_width)
        g = dataclasses.replace(g, partition_plan=plan)
        shapes.add(tuple(np.asarray(x).shape for x in
                         (plan.xp_pair_dst, plan.xp_pair_dst_t,
                          plan.ell_src)))
        got = run(q, k, v, g)
        want = default_edge_fusion(OPS, "attention", q, k, v, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        g_part = jax.grad(lambda v: jnp.sum(run(q, k, v, g) ** 2))(v)
        g_ref = jax.grad(lambda v: jnp.sum(
            default_edge_fusion(OPS, "attention", q, k, v, g) ** 2))(v)
        np.testing.assert_allclose(np.asarray(g_part), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)
    assert len(shapes) == 1, shapes

    # WITHOUT the opt-in (capacities_of's default — the production path in
    # parallel/context.py) the same edge_fn must take the documented ELL
    # gather FALLBACK, not raise, even though the static capacity plan
    # auto-carries its own expanded arrays (round-5 regression guard).
    g = _build(0)
    with _w.catch_warnings():
        _w.simplefilter("ignore", UserWarning)
        plan0 = partition_batch(g, 1, 2, capacities_of(cap_plan))
    assert plan0.xp_pair_dst is None
    g0 = dataclasses.replace(g, partition_plan=plan0)
    got0 = run(q, k, v, g0)
    want0 = default_edge_fusion(OPS, "attention", q, k, v, g0)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dynamic_partitioned_hideg_train_e2e():
    """Full composition through train(): dynamic >128-degree capacity x
    edge partitioning x the ParallelConfig.expanded_plan_pairs opt-in —
    per-batch plans carry per-shard expanded arrays and the step trains.
    (CPU falls back to the ELL math inside shard_map; the plan machinery
    and config plumbing are what this exercises e2e — the kernels
    themselves are chip-gated by bench.py.) 180 pairs >= nt_dst*nt_src
    (18*9), the absolute per-shard bound, so no topology can violate."""
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg(num_robots=144, scenes_per_batch=2)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, steps=2, log_every=1,
                                  eval_every=0, checkpoint_every=0),
        parallel=dataclasses.replace(cfg.parallel, data_axis_size=1,
                                     graph_axis_size=2, ops_impl="xla",
                                     expanded_plan_pairs=180),
    )
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 2


def test_parallel_context_expanded_plan_pairs_plumbing():
    """ParallelConfig.expanded_plan_pairs reaches the dynamic capacity set
    (the config-path opt-in for >128-degree partitioned streams)."""
    from mrp_gnn_tpu.parallel.context import make_parallel_context
    cfg = _tiny_cfg(scenes_per_batch=2)
    cfg = cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, data_axis_size=1, graph_axis_size=2,
        expanded_plan_pairs=32))
    ctx = make_parallel_context(cfg, None)  # dynamic: no static graph
    assert ctx is not None and ctx.dyn_caps is not None
    assert ctx.dyn_caps.xp_pairs == 32


def test_dynamic_partitioned_capacity_violation_raises():
    from mrp_gnn_tpu.parallel.partition import partition_batch
    caps, _ = _dyn_partitioned_setup(2, 4, S=4, N=32)
    g = _dyn_graph(0, S=4, N=32)
    bad = dataclasses.replace(caps, ell_width=8)  # force an overflow
    with pytest.raises(ValueError, match="capacity"):
        partition_batch(g, 2, 4, bad)


@pytest.mark.slow
def test_dynamic_partitioned_train_short_run():
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg(num_robots=8, scenes_per_batch=4)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, steps=4, log_every=2,
                                  eval_every=0, checkpoint_every=0),
        parallel=dataclasses.replace(cfg.parallel, data_axis_size=2,
                                     graph_axis_size=2, ops_impl="xla"),
    )
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 4


@pytest.mark.slow
def test_dynamic_partitioned_grad_accum_train():
    """Full composition: dynamic topology x edge partitioning x gradient
    accumulation — per-microbatch plans ride the stacked graph pytree into
    the scanned shard_map step."""
    import jax
    from mrp_gnn_tpu.train import train
    cfg = _tiny_cfg(num_robots=8, scenes_per_batch=4)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, steps=3, log_every=1,
                                  eval_every=0, checkpoint_every=0,
                                  grad_accum_steps=2),
        parallel=dataclasses.replace(cfg.parallel, data_axis_size=2,
                                     graph_axis_size=2, ops_impl="xla"),
    )
    state, recs = train(cfg)
    assert np.isfinite(recs[-1]["total"])
    assert int(jax.device_get(state.step)) == 3
