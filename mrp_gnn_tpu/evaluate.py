"""Evaluation: checkpoint load -> jitted forward -> depth / seg metrics.

Mirrors the reference's eval script outputs (depth RMSE / AbsRel / delta
accuracies, seg mIoU — SURVEY.md section 3.2, BASELINE.json:2) with a
jit-compiled metric accumulator.

CLI: python -m mrp_gnn_tpu.evaluate --config five_robot_attention \
        --checkpoint_dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mrp_gnn_tpu import metrics as M
from mrp_gnn_tpu.config import ExperimentConfig, get_config
from mrp_gnn_tpu.data.pipeline import make_dataset
from mrp_gnn_tpu.models import MultiRobotPerceptionNet
from mrp_gnn_tpu.train import create_train_state


# Jitted eval steps cached per (model config, ops backend, edge_fn object):
# periodic in-training validation (TrainConfig.eval_every) calls evaluate()
# repeatedly with identical structure — a fresh closure under jax.jit would
# pay a full recompile each time (minutes on the axon chip). Each entry
# holds a strong reference to its edge_fn, so the id() in the key cannot be
# recycled by a different object while the entry is alive.
_EVAL_STEP_CACHE: dict = {}


def _get_eval_step(model_cfg, ops_impl: str, edge_fn):
    key = (model_cfg, ops_impl, None if edge_fn is None else id(edge_fn))
    cached = _EVAL_STEP_CACHE.get(key)
    if cached is not None:
        return cached[0], cached[1]
    model = MultiRobotPerceptionNet(model_cfg, ops_impl=ops_impl,
                                    edge_fusion_fn=edge_fn)
    num_classes = model_cfg.num_seg_classes

    @jax.jit
    def eval_step(params, images, depth, seg, graph):
        out = model.apply(params, images, graph)
        res = {}
        if "depth" in out:
            res["depth"] = M.depth_metrics_accumulate(out["depth"], depth,
                                                      graph.node_mask)
        if "seg_logits" in out:
            res["conf"] = M.seg_confusion_accumulate(out["seg_logits"], seg,
                                                     graph.node_mask, num_classes)
        return res

    if len(_EVAL_STEP_CACHE) > 16:  # bound the cache
        _EVAL_STEP_CACHE.clear()
    _EVAL_STEP_CACHE[key] = (model, eval_step, edge_fn)  # pin edge_fn's id
    return model, eval_step


def evaluate(cfg: ExperimentConfig, params: Any, pctx=None,
             dump_dir: str | None = None) -> dict:
    """Run the eval split; returns a flat dict of float metrics.

    pctx: optional ParallelContext — evaluates with the partitioned fusion
    path and mesh-sharded batches (config 5). Metric sums are global (the
    jitted program reduces over the whole sharded batch).
    dump_dir: write qualitative prediction panels (utils/viz.py) for the
    first eval batch.
    """
    edge_fn = pctx.edge_fusion_fn if pctx is not None else None
    model, eval_step = _get_eval_step(cfg.model, cfg.parallel.ops_impl,
                                      edge_fn)

    node_range = None
    if pctx is not None and not pctx.spatial and jax.process_count() > 1:
        # per-host eval sharding (same scheme as training): render only the
        # scenes this process's devices address
        d = cfg.data
        node_range = pctx.local_node_range(
            d.max_nodes or d.scenes_per_batch * d.num_robots)
    acc = None
    n_batches = 0
    for batch in make_dataset(cfg.data, "eval", shuffle=False,
                              node_range=node_range):
        if pctx is not None:
            batch = pctx.shard_batch(batch)
        res = eval_step(params, jnp.asarray(batch["images"]),
                        jnp.asarray(batch["depth"]),
                        jnp.asarray(batch["seg"]), batch["graph"])
        acc = res if acc is None else M.tree_add(acc, res)
        if dump_dir and n_batches == 0 and node_range is None:
            # (panels need host-visible pixels; per-host-sharded eval skips)
            from mrp_gnn_tpu.utils.viz import save_panels
            out = jax.device_get(model.apply(
                params, jnp.asarray(batch["images"]), batch["graph"]))
            save_panels(dump_dir, np.asarray(batch["images"]), out,
                        {"depth": np.asarray(batch["depth"]),
                         "seg": np.asarray(batch["seg"])},
                        np.asarray(batch["graph"].node_mask),
                        cfg.model.min_depth, cfg.model.max_depth)
        n_batches += 1
    if acc is None:
        raise ValueError("eval split produced no batches")

    out = {"eval_batches": n_batches}
    if "depth" in acc:
        out.update({k: float(v) for k, v in
                    M.depth_metrics_finalize(acc["depth"]).items()})
    if "conf" in acc:
        out["miou"] = float(M.seg_miou(acc["conf"]))
        out["iou_per_class"] = [
            round(float(x), 5) for x in M.seg_per_class_iou(acc["conf"])]
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--dataset_root", default=None,
                   help="evaluate on on-disk scene folders (docs/data.md)")
    p.add_argument("--dump_dir", default=None,
                   help="write qualitative prediction panels (PNG) here")
    from mrp_gnn_tpu.train import add_multihost_args, init_multihost
    add_multihost_args(p)
    args = p.parse_args(argv)
    init_multihost(args)
    from mrp_gnn_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    cfg = get_config(args.config)
    if args.dataset_root is not None:
        import dataclasses
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, dataset_root=args.dataset_root))
    sample = next(iter(make_dataset(cfg.data, "eval", shuffle=False)))
    from mrp_gnn_tpu.train import make_parallel
    pctx = make_parallel(cfg)
    state, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), sample,
        edge_fusion_fn=pctx.edge_fusion_fn if pctx else None)
    if args.checkpoint_dir:
        from mrp_gnn_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {args.checkpoint_dir}")
        state = restored
        print(f"[eval] restored step {mgr.latest_step}")
    results = evaluate(cfg, state.params, pctx=pctx, dump_dir=args.dump_dir)
    if args.dump_dir:
        print(f"[eval] qualitative panels -> {args.dump_dir}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
