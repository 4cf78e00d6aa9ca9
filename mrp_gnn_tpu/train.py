"""Training loop: jitted train step, optax optimizer, orbax checkpointing.

The reference's train.py runs a plain epoch loop with Adam and torch.save
checkpoints (SURVEY.md section 3.1, reconstructed — reference mount empty).
TPU-native differences: the whole step (fwd, loss, bwd, update) is one jitted
XLA program with donated state; batches stream host->device; checkpoints are
async orbax saves of the full train-state pytree.

CLI: python -m mrp_gnn_tpu.train --config five_robot_attention --steps 200
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrp_gnn_tpu.config import ExperimentConfig, get_config
from mrp_gnn_tpu.graph import GraphBatch
from mrp_gnn_tpu.losses import total_loss
from mrp_gnn_tpu.models import MultiRobotPerceptionNet


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Full reproducibility state: everything a resume needs is checkpointed
    together — params, optimizer moments, step, the run PRNG key, and the
    best-eval tracking (so periodic-eval best-step reporting survives
    restarts)."""
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    best_rmse: jax.Array
    best_step: jax.Array


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.train.learning_rate,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(cfg.train.steps, cfg.train.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adamw(schedule, weight_decay=cfg.train.weight_decay),
    )


def create_train_state(cfg: ExperimentConfig, rng: jax.Array,
                       sample_batch: dict,
                       edge_fusion_fn: Optional[Callable] = None) -> tuple:
    """Initialize model params + optimizer state. Returns (state, model)."""
    model = MultiRobotPerceptionNet(cfg.model, ops_impl=cfg.parallel.ops_impl,
                                    edge_fusion_fn=edge_fusion_fn)
    init_rng, run_rng = jax.random.split(rng)
    params = model.init(init_rng, jnp.asarray(sample_batch["images"]),
                        sample_batch["graph"])
    tx = make_optimizer(cfg)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32), rng=run_rng,
                       best_rmse=jnp.asarray(jnp.inf, jnp.float32),
                       best_step=jnp.asarray(-1, jnp.int32))
    return state, model


def make_train_step(cfg: ExperimentConfig, model: MultiRobotPerceptionNet,
                    tx: optax.GradientTransformation,
                    donate: bool = True) -> Callable:
    accum = max(cfg.train.grad_accum_steps, 1)

    def apply_fn(params, images, graph):
        return model.apply(params, images, graph)

    if cfg.train.remat:
        # Full-forward rematerialization: backward recomputes activations
        # instead of holding every feature map live (SURVEY.md "HBM
        # bandwidth" — remat trades FLOPs for memory).
        apply_fn = jax.checkpoint(apply_fn, static_argnums=())

    def grads_of(params, images, depth, seg, graph):
        def loss_fn(params):
            out = apply_fn(params, images, graph)
            loss, terms = total_loss(out, {"depth": depth, "seg": seg},
                                     graph.node_mask,
                                     cfg.train.depth_loss_weight,
                                     cfg.train.seg_loss_weight,
                                     depth_loss=cfg.train.depth_loss)
            return loss, terms

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, images, depth, seg, graph: GraphBatch):
        if accum == 1:
            (_, terms), grads = grads_of(state.params, images, depth, seg, graph)
        else:
            # images/depth/seg carry a leading [accum] microbatch axis; one
            # scan accumulates grads on-device, then a single optimizer step.
            # Dynamic topology stacks the per-microbatch GRAPHS too (the
            # stacker; shapes are capacity-pinned), so the scan carries the
            # graph in xs and each microbatch aggregates under its own
            # topology; static topology keeps the single shared graph closed
            # over (detected statically by the stacked n_nodes rank).
            stacked_graphs = jnp.ndim(graph.n_nodes) > 0
            g0 = (jax.tree_util.tree_map(lambda x: x[0], graph)
                  if stacked_graphs else graph)

            def micro(carry, xs):
                g_sum, t_sum = carry
                im, dp, sg = xs[:3]
                gr = xs[3] if stacked_graphs else graph
                (_, terms), g = grads_of(state.params, im, dp, sg, gr)
                return (jax.tree_util.tree_map(jnp.add, g_sum, g),
                        jax.tree_util.tree_map(jnp.add, t_sum, terms)), ()

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zeros_t = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(lambda p: grads_of(
                    p, images[0], depth[0], seg[0], g0)[0][1], state.params))
            xs = ((images, depth, seg, graph) if stacked_graphs
                  else (images, depth, seg))
            (g_sum, t_sum), _ = jax.lax.scan(
                micro, (zeros_g, zeros_t), xs)
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            terms = jax.tree_util.tree_map(lambda t: t / accum, t_sum)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, params=params, opt_state=opt_state, step=state.step + 1,
            rng=jax.random.fold_in(state.rng, state.step))
        terms["grad_norm"] = optax.global_norm(grads)
        return new_state, terms

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def replica_graph_for(cfg: ExperimentConfig) -> GraphBatch:
    """Per-data-replica GraphBatch for the partitioned path (config 5).

    The parallel layout needs node slots to tile exactly: scenes divide over
    data shards and each replica's nodes divide over graph shards with no
    trailing padding (padding would interleave between replicas otherwise).
    """
    from mrp_gnn_tpu.graph import batch_homogeneous, scene_edges_for
    pc, d = cfg.parallel, cfg.data
    if d.scenes_per_batch % pc.data_axis_size:
        raise ValueError(f"scenes_per_batch={d.scenes_per_batch} not divisible "
                         f"by data_axis_size={pc.data_axis_size}")
    scenes_rep = d.scenes_per_batch // pc.data_axis_size
    v_rep = scenes_rep * d.num_robots
    if v_rep % pc.graph_axis_size:
        raise ValueError(f"replica nodes {v_rep} not divisible by "
                         f"graph_axis_size={pc.graph_axis_size}")
    return batch_homogeneous(
        scenes_rep, d.num_robots,
        scene_edges_for(d.num_robots, d.connectivity, d.comm_radius))


def make_parallel(cfg: ExperimentConfig):
    """ParallelContext for cfg, or None for a trivial 1x1 mesh."""
    from mrp_gnn_tpu.parallel.context import make_parallel_context
    pc = cfg.parallel
    ndev = jax.device_count()
    if pc.data_axis_size * pc.graph_axis_size * pc.model_axis_size > ndev:
        # Degrade gracefully on smaller machines: shrink axes (graph first,
        # then model, then data) until the mesh fits, instead of failing a
        # preset like swarm_partitioned on a single chip.
        d, g, m = pc.data_axis_size, pc.graph_axis_size, pc.model_axis_size
        while d * g * m > ndev:
            if g > 1:
                g = max(g // 2, 1)
            elif m > 1:
                m = max(m // 2, 1)
            else:
                d = max(d // 2, 1)
        print(f"[train] mesh {pc.data_axis_size}x{pc.graph_axis_size}"
              f"x{pc.model_axis_size} needs more than {ndev} device(s); "
              f"clamped to {d}x{g}x{m}")
        pc = dataclasses.replace(pc, data_axis_size=d, graph_axis_size=g,
                                 model_axis_size=m)
        cfg = cfg.replace(parallel=pc)
    if pc.data_axis_size * pc.graph_axis_size * pc.model_axis_size <= 1:
        return None
    if pc.graph_axis_size <= 1:
        # DP/TP-only: no edge partition plan needed; replica graph = batch
        # graph, and divisibility is enforced by the sharding itself.
        return make_parallel_context(cfg, None)
    return make_parallel_context(cfg, replica_graph_for(cfg))


class _MicrobatchStacker:
    """Groups ``accum`` consecutive batches into one stacked step input.

    Microbatches are copied into a preallocated ``[accum, ...]`` block as
    they arrive (peak host memory = one stacked block + one microbatch, not
    two full stacked copies), and a daemon thread keeps the next group ready
    so host-side stacking overlaps device compute instead of serializing
    with it.
    """

    def __init__(self, it: Iterator[dict], accum: int,
                 close_inner: bool = True):
        import queue
        import threading
        self._it, self._accum = it, accum
        self._close_inner = close_inner  # False: caller owns the inner it
        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._last_state = None
        self._done: BaseException | None = None
        self._has_state = hasattr(it, "get_state")
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _build(self) -> tuple:
        b0 = next(self._it)
        out = {k: np.empty((self._accum,) + b0[k].shape, b0[k].dtype)
               for k in ("images", "depth", "seg")}
        for k in out:
            out[k][0] = b0[k]
        graphs = [b0["graph"]]
        for i in range(1, self._accum):
            b = next(self._it)
            for k in out:
                out[k][i] = b[k]
            graphs.append(b["graph"])
        if "node_range" in b0:  # per-host sharded pipeline (constant)
            out["node_range"] = b0["node_range"]
        if all(g is graphs[0] for g in graphs[1:]):
            # static topology: the pipeline reuses one GraphBatch object
            out["graph"] = graphs[0]
        else:
            # dynamic topology: stack per-microbatch graphs (and their
            # attached partition plans) on a leading [accum] axis; shapes
            # are batch-invariant under the stream's pinned capacities, and
            # the train step scans over the stacked graph (stacked_graphs
            # in make_train_step).
            out["graph"] = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *graphs)
        # Iterator-state snapshot AFTER consuming this group's accum batches
        # (same snapshot-on-enqueue pattern as TransformIterator): the inner
        # get_state() is consumer-exact w.r.t. THIS thread, so the snapshot
        # reflects exactly the batches folded into this group — get_state()
        # below then aligns with groups handed to the training loop, not
        # with the producer's prefetch position.
        state = self._it.get_state() if self._has_state else None
        return state, out

    def _fill(self):
        # Exceptions (including StopIteration from an exhausted iterator)
        # must cross the thread boundary: enqueue them and re-raise in
        # __next__, else the consumer blocks forever on an empty queue.
        from mrp_gnn_tpu.data.pipeline import _bounded_put
        while not self._stop.is_set():
            try:
                item = self._build()
            except BaseException as e:  # noqa: BLE001 — relayed, not dropped
                _bounded_put(self._q, self._stop, e)
                return
            _bounded_put(self._q, self._stop, item)

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        if self._done is not None:
            # terminal state survives close()'s queue drain: repeated calls
            # keep raising instead of blocking on the empty queue
            if isinstance(self._done, StopIteration):
                raise StopIteration from self._done
            raise self._done
        item = self._q.get()
        if isinstance(item, BaseException):
            self._done = item
            if isinstance(item, StopIteration):
                raise StopIteration from item
            raise item
        self._last_state, group = item
        return group

    def get_state(self):
        """Inner-iterator state aligned with the last group handed to the
        training loop (ADVICE r3: the producer thread prefetches ahead, so
        the raw iterator's live state overshoots consumption)."""
        return self._last_state

    def close(self):
        self._stop.set()
        if self._close_inner and hasattr(self._it, "close"):
            self._it.close()  # cascade: unblock a producer stuck in next()
        try:
            self._q.get_nowait()  # unblock the producer if it is waiting
        except Exception:
            pass
        self._thread.join(timeout=2.0)
        self._done = self._done or StopIteration("closed")


def train(cfg: ExperimentConfig, num_steps: int | None = None,
          log_fn: Callable[[dict], None] | None = None,
          data_iter: Iterator[dict] | None = None) -> tuple:
    """Run training; returns (final TrainState, list of logged records)."""
    steps = num_steps if num_steps is not None else cfg.train.steps
    accum = max(cfg.train.grad_accum_steps, 1)
    pctx = make_parallel(cfg)

    def _place(b):
        """Device placement of one batch — runs on the PRODUCER thread so
        the host->device conversions (34 ms/step for a 256-view batch on
        this rig) overlap device compute instead of serializing with the
        step dispatch. Marked so the training loop does not re-place."""
        if pctx is not None:
            b = pctx.shard_batch(b)
        else:
            b = {k: (jnp.asarray(v) if k in ("images", "depth", "seg")
                     else v) for k, v in b.items()}
        return {**b, "_placed": True}

    def _wrap_stream(base):
        """Assemble the batch stream: a TransformIterator running per-batch
        host work on a PRODUCER thread — partition-plan attachment (dynamic
        partitioned topologies) and, for accum == 1, device placement —
        then microbatch stacking (accum > 1 stays host-side until the
        stacked group is placed by the loop). Returns (iterator, state
        handle): the handle carries get_state() aligned with consumption."""
        tf = None
        if pctx is not None and pctx.dyn_caps is not None:
            tf = lambda b: {**b, "graph": pctx.attach_plan(b["graph"])}
        if accum == 1:
            attach = tf
            tf = (lambda b: _place(attach(b))) if attach else _place
        # A caller-provided data_iter is caller-OWNED: our wrappers must
        # not cascade close() into it (a generator would be terminated).
        own_base = data_iter is None
        raw = base
        if tf is not None:
            from mrp_gnn_tpu.data.pipeline import TransformIterator
            raw = TransformIterator(base, tf, close_inner=own_base)
        if accum > 1:
            return _MicrobatchStacker(
                raw, accum, close_inner=(raw is not base) or own_base), raw
        return raw, raw

    def _close_stream(it, raw):
        for h in (it, raw):
            if hasattr(h, "close"):
                h.close()

    def _pipeline_node_range():
        """Per-host node rows for the sharded builtin pipeline (each
        process renders only the scenes its devices address); None keeps
        the full-batch pipeline (single process, spatial sharding, or a
        non-contiguous addressable layout)."""
        if pctx is None or pctx.spatial or jax.process_count() == 1:
            return None
        d = cfg.data
        V = d.max_nodes or d.scenes_per_batch * d.num_robots
        return pctx.local_node_range(V)

    if data_iter is not None:
        base = data_iter
    else:
        from mrp_gnn_tpu.data.pipeline import make_train_iterator
        base = make_train_iterator(cfg.data,
                                   node_range=_pipeline_node_range())
    it, raw_it = _wrap_stream(base)
    first = next(it)

    rng = jax.random.PRNGKey(cfg.train.seed)

    def _graph0(graph):
        """First microbatch's graph when graphs are stacked (dynamic +
        accumulation); the shared graph otherwise."""
        if np.ndim(np.asarray(graph.n_nodes)) > 0:
            return jax.tree_util.tree_map(lambda x: x[0], graph)
        return graph

    def _init_images(first):
        """Init-trace images: GLOBAL node shape even when the per-host
        pipeline yields only this process's rows (values are irrelevant to
        parameter shapes). Works on host numpy AND producer-placed device
        arrays without materializing either."""
        im = first["images"] if accum == 1 else first["images"][0]
        if first.get("node_range") is not None:
            Vg = int(np.asarray(_graph0(first["graph"]).node_mask
                                ).shape[-1])
            if im.shape[0] != Vg:
                return np.zeros((Vg,) + tuple(im.shape[1:]),
                                np.dtype(im.dtype))
        return im

    init_batch = {"images": _init_images(first),
                  "graph": _graph0(first["graph"])}
    state, model = create_train_state(
        cfg, rng, init_batch,
        edge_fusion_fn=pctx.edge_fusion_fn if pctx else None)
    if pctx is not None:
        state = pctx.shard_state(state)
        if not first.get("_placed"):
            first = pctx.shard_batch(first, leading_accum=accum > 1)
    tx = make_optimizer(cfg)
    step_fn = make_train_step(cfg, model, tx)

    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        import os
        from mrp_gnn_tpu.checkpoint import CheckpointManager
        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        if jax.process_index() == 0:
            # reproducibility: the config that produced these checkpoints
            os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
            with open(os.path.join(cfg.train.checkpoint_dir,
                                   "config.json"), "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2)
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored
            if data_iter is None and int(state.step) > 0:
                # continue the data stream where the checkpoint left off:
                # O(1) seek via saved iterator state (grain) or epoch/offset
                # fast-forward (builtin) — never render-and-discard.
                from mrp_gnn_tpu.data.pipeline import make_train_iterator
                _close_stream(it, raw_it)  # stop stale pre-resume threads
                it, raw_it = _wrap_stream(make_train_iterator(
                    cfg.data, start_batch=int(state.step) * accum,
                    data_state=ckpt_mgr.latest_data_state(),
                    node_range=_pipeline_node_range()))
                batch0 = next(it)
                # Mirror the first-batch guard above: with accum == 1 the
                # producer thread already device-placed the batch — a second
                # shard_batch would np.asarray a node-sharded global Array
                # spanning non-addressable devices (multi-host crash).
                first = (batch0 if batch0.get("_placed")
                         else pctx.shard_batch(batch0, leading_accum=accum > 1)
                         if pctx else batch0)

    tb_writer = None
    if cfg.train.tensorboard_dir:
        from clu import metric_writers
        tb_writer = metric_writers.create_default_writer(
            cfg.train.tensorboard_dir, just_logging=jax.process_index() > 0)

    records = []
    # best tracking lives in TrainState so it survives checkpoint/resume
    best_rmse = float(jax.device_get(state.best_rmse))
    best_step = int(jax.device_get(state.best_step))
    batch = first
    nn = np.asarray(first["graph"].n_nodes)
    ne = np.asarray(first["graph"].n_edges)
    # stacked dynamic graphs carry per-microbatch counts; sum them
    n_nodes = int(nn.sum()) if nn.ndim else int(nn) * accum
    n_edges = int(ne.sum()) if ne.ndim else int(ne) * accum
    t0 = time.perf_counter()
    t_last, step_last = t0, int(state.step)
    start_step = int(state.step)
    try:
        for i in range(start_step, steps):
            if pctx is not None and i > start_step and not batch.get("_placed"):
                batch = pctx.shard_batch(batch, leading_accum=accum > 1)
            state, terms = step_fn(state, jnp.asarray(batch["images"]),
                                   jnp.asarray(batch["depth"]),
                                   jnp.asarray(batch["seg"]), batch["graph"])
            if (i + 1) % cfg.train.log_every == 0 or i == steps - 1:
                terms = jax.device_get(terms)
                now = time.perf_counter()
                dt = (now - t_last) / max(i + 1 - step_last, 1)
                t_last, step_last = now, i + 1
                rec = {"step": i + 1,
                       **{k: float(v) for k, v in terms.items()},
                       "wall_s": now - t0, "step_time_s": dt,
                       "views_per_s": n_nodes / dt,
                       "edges_per_s": n_edges / dt}
                records.append(rec)
                if log_fn:
                    log_fn(rec)
                if cfg.train.halt_on_nonfinite and not np.isfinite(rec["total"]):
                    # Failure detection (SURVEY.md section 5): stop before the
                    # divergent state can overwrite a good checkpoint; the last
                    # saved checkpoint remains the restart point.
                    raise FloatingPointError(
                        f"non-finite loss {rec['total']} at step {i + 1}; "
                        f"restart resumes from the last checkpoint")
                if tb_writer is not None:
                    tb_writer.write_scalars(
                        i + 1, {k: v for k, v in rec.items()
                                if k not in ("step",) and isinstance(v, float)})
            if (cfg.train.eval_every and (i + 1) % cfg.train.eval_every == 0):
                from mrp_gnn_tpu.evaluate import evaluate
                ev = evaluate(cfg, state.params, pctx=pctx)
                ev_rec = {"step": i + 1,
                          **{f"eval_{k}": v for k, v in ev.items()}}
                records.append(ev_rec)
                if log_fn:
                    log_fn(ev_rec)
                if tb_writer is not None:
                    tb_writer.write_scalars(
                        i + 1, {k: float(v) for k, v in ev_rec.items()
                                if k != "step" and np.isscalar(v)})
                if "rmse" in ev and ev["rmse"] < best_rmse:
                    best_rmse, best_step = ev["rmse"], i + 1
                    state = dataclasses.replace(
                        state,
                        best_rmse=jnp.asarray(best_rmse, jnp.float32),
                        best_step=jnp.asarray(best_step, jnp.int32))
            if ckpt_mgr and ((i + 1) % cfg.train.checkpoint_every == 0
                             or i == steps - 1):
                # Consumer-aligned iterator state: the stacker/transform
                # wrappers snapshot the inner state per delivered item, so
                # prefetch-ahead never overshoots the saved position
                # (ADVICE r3).
                src = it if hasattr(it, "get_state") else raw_it
                ds_state = (src.get_state()
                            if hasattr(src, "get_state") else None)
                ckpt_mgr.save(i + 1, state, data_state=ds_state)
            batch = next(it)
    finally:
        # Stop producer threads on EVERY exit (normal completion, the NaN
        # watchdog's FloatingPointError, KeyboardInterrupt): repeated
        # in-process train() calls must not accumulate live threads.
        _close_stream(it, raw_it)
    if best_step >= 0:
        rec = {"step": steps, "best_eval_rmse": best_rmse,
               "best_eval_step": best_step}
        records.append(rec)
        if log_fn:
            log_fn(rec)
    if ckpt_mgr:
        ckpt_mgr.close()
    if tb_writer is not None:
        tb_writer.flush()
    return state, records


def add_multihost_args(p: argparse.ArgumentParser) -> None:
    """Multi-host bring-up flags shared by the train/eval CLIs (SURVEY.md
    section 3.5): one process per host, jax.distributed.initialize before
    any backend touch (parallel/launch.py)."""
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0; enables jax.distributed")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--local_device_count", type=int, default=None,
                   help="per-process virtual CPU device count (CPU sim only)")


def init_multihost(args) -> None:
    """Call launch.initialize from parsed CLI flags (no-op without
    --coordinator). Must run before any jax backend initialization."""
    from mrp_gnn_tpu.parallel.launch import initialize
    initialize(coordinator=args.coordinator,
               num_processes=args.num_processes,
               process_id=args.process_id,
               local_device_count=args.local_device_count)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--log_every", type=int, default=None)
    p.add_argument("--tensorboard_dir", default=None)
    p.add_argument("--depth_loss", default=None, choices=["l1", "berhu", "silog"])
    p.add_argument("--train_scenes", type=int, default=None)
    p.add_argument("--dataset_root", default=None,
                   help="train from on-disk scene folders (docs/data.md)")
    p.add_argument("--grad_accum", type=int, default=None)
    p.add_argument("--eval_every", type=int, default=None)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--max_restarts", type=int, default=0,
                   help="on non-finite loss, resume from the last checkpoint "
                        "with halved LR up to N times (needs "
                        "--checkpoint_dir)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="enable jax_debug_nans + host-side graph validation")
    p.add_argument("--data_axis", type=int, default=None,
                   help="override ParallelConfig.data_axis_size")
    p.add_argument("--graph_axis", type=int, default=None,
                   help="override ParallelConfig.graph_axis_size")
    p.add_argument("--model_axis", type=int, default=None,
                   help="override ParallelConfig.model_axis_size")
    p.add_argument("--expanded_plan_pairs", type=int, default=None,
                   help="override ParallelConfig.expanded_plan_pairs — the "
                        "per-shard row-expanded plan opt-in for dynamic "
                        "partitioned streams past the 128-degree kernel cap"
                        " (docs/kernels.md)")
    add_multihost_args(p)
    args = p.parse_args(argv)

    # Bring-up order matters: distributed init (if any) before the platform
    # env is applied and before the first jax backend call below.
    init_multihost(args)
    from mrp_gnn_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    cfg = get_config(args.config)
    tr = cfg.train
    if args.lr is not None:
        tr = dataclasses.replace(tr, learning_rate=args.lr)
    if args.checkpoint_dir is not None:
        tr = dataclasses.replace(tr, checkpoint_dir=args.checkpoint_dir)
    if args.log_every is not None:
        tr = dataclasses.replace(tr, log_every=args.log_every)
    if args.tensorboard_dir is not None:
        tr = dataclasses.replace(tr, tensorboard_dir=args.tensorboard_dir)
    if args.depth_loss is not None:
        tr = dataclasses.replace(tr, depth_loss=args.depth_loss)
    if args.steps is not None:
        tr = dataclasses.replace(tr, steps=args.steps)
    if args.grad_accum is not None:
        tr = dataclasses.replace(tr, grad_accum_steps=args.grad_accum)
    if args.eval_every is not None:
        tr = dataclasses.replace(tr, eval_every=args.eval_every)
    if args.remat:
        tr = dataclasses.replace(tr, remat=True)
    cfg = cfg.replace(train=tr)
    if args.train_scenes is not None:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, num_train_scenes=args.train_scenes))
    if args.augment:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, augment=True))
    if args.dataset_root is not None:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, dataset_root=args.dataset_root))
    if args.dtype is not None:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    dtype=args.dtype))
    pc = cfg.parallel
    if args.data_axis is not None:
        pc = dataclasses.replace(pc, data_axis_size=args.data_axis)
    if args.graph_axis is not None:
        pc = dataclasses.replace(pc, graph_axis_size=args.graph_axis)
    if args.model_axis is not None:
        pc = dataclasses.replace(pc, model_axis_size=args.model_axis)
    if args.expanded_plan_pairs is not None:
        pc = dataclasses.replace(pc,
                                 expanded_plan_pairs=args.expanded_plan_pairs)
    cfg = cfg.replace(parallel=pc)

    if args.debug:
        from mrp_gnn_tpu.utils.debug import enable_debug, validate_graph
        enable_debug()
        from mrp_gnn_tpu.data.pipeline import make_dataset
        validate_graph(next(iter(make_dataset(cfg.data, "train"))) ["graph"])
        print("[train] debug mode: jax_debug_nans on, graph validated")

    print(f"[train] config={cfg.name} steps={cfg.train.steps} "
          f"backend={jax.default_backend()} devices={jax.device_count()}")
    # Restart-based divergence recovery (SURVEY.md section 5 "Failure
    # detection"): the watchdog raises before a bad state is checkpointed;
    # resuming replays from the last good checkpoint with halved LR so the
    # deterministic data stream does not re-diverge identically.
    restarts = 0
    while True:
        try:
            _, records = train(cfg, log_fn=lambda r: print(json.dumps(r)))
            break
        except FloatingPointError as e:
            if restarts >= args.max_restarts or not cfg.train.checkpoint_dir:
                raise
            restarts += 1
            new_lr = cfg.train.learning_rate * 0.5
            print(f"[train] {e}; restart {restarts}/{args.max_restarts} "
                  f"with lr={new_lr:g}")
            cfg = cfg.replace(train=dataclasses.replace(
                cfg.train, learning_rate=new_lr))
    losses = [r["total"] for r in records if "total" in r]
    if losses:
        print(f"[train] final loss {losses[-1]:.4f}")


if __name__ == "__main__":
    main()
