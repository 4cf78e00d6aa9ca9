"""Inference / serving path: fixed-shape jitted predictor + portable export.

The reference has no serving story beyond running its eval script
(SURVEY.md section 3.2 — reconstructed, reference mount empty). This module
is the new framework's production-inference tier:

- ``Predictor``: a checkpoint-loaded, jit-compiled, fixed-shape forward for
  one scene batch — the graph topology and batch capacity are baked in at
  construction so the one compiled program serves every request (static XLA
  shapes; SURVEY.md section 7 "static shapes everywhere").
- ``export_predictor`` / ``load_exported``: ahead-of-time serialization of
  the predictor (params baked in as constants) to portable StableHLO bytes
  via ``jax.export`` — a self-contained artifact deployable to any process
  with a compatible runtime, no Python model code needed at load time.

CLI:
  python -m mrp_gnn_tpu.serving --config five_robot_attention \
      --checkpoint_dir /tmp/ckpt --export /tmp/model.hlo [--bench]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrp_gnn_tpu.config import ExperimentConfig, get_config
from mrp_gnn_tpu.graph import GraphBatch


def _scene_graph(cfg: ExperimentConfig) -> GraphBatch:
    from mrp_gnn_tpu.graph import batch_homogeneous, scene_edges_for
    d = cfg.data
    return batch_homogeneous(
        d.scenes_per_batch, d.num_robots,
        scene_edges_for(d.num_robots, d.connectivity, d.comm_radius))


class Predictor:
    """Fixed-shape inference on one device.

    images: float [V, H, W, 3] with V = scenes_per_batch * num_robots
    (pad the final partial batch; padded slots are zeroed by node_mask).
    Returns {"depth": [V, H, W], "seg": int [V, H, W] (if configured)}.
    """

    def __init__(self, cfg: ExperimentConfig, params: Any,
                 graph: Optional[GraphBatch] = None):
        from mrp_gnn_tpu.models import MultiRobotPerceptionNet
        self.cfg = cfg
        self.graph = graph if graph is not None else _scene_graph(cfg)
        model = MultiRobotPerceptionNet(cfg.model,
                                        ops_impl=cfg.parallel.ops_impl)
        h, w = cfg.data.image_size
        self.batch_nodes = self.graph.max_nodes
        self.input_shape = (self.batch_nodes, h, w, cfg.model.in_channels)

        def forward(params, images):
            out = model.apply(params, images, self.graph)
            res = {"depth": out["depth"]} if "depth" in out else {}
            if "seg_logits" in out:
                res["seg"] = jnp.argmax(out["seg_logits"], axis=-1)
            return res

        self._params = params
        self._fn = jax.jit(forward)

    def __call__(self, images) -> dict:
        images = jnp.asarray(images, jnp.float32)
        if images.shape != self.input_shape:
            raise ValueError(f"expected images {self.input_shape}, "
                             f"got {tuple(images.shape)}")
        return jax.device_get(self._fn(self._params, images))

    def predict_scenes(self, scene_images) -> list:
        """Convenience: any number of scenes, chunked + padded to the
        compiled batch shape.

        scene_images: sequence of [num_robots, H, W, 3] arrays.
        Returns a per-scene list of output dicts (padding stripped).
        """
        n = self.cfg.data.num_robots
        bs = self.cfg.data.scenes_per_batch
        scenes = [np.asarray(s, np.float32) for s in scene_images]
        for s in scenes:
            if s.shape[0] != n or s.shape[1:] != self.input_shape[1:]:
                raise ValueError(f"each scene must be [{n}, "
                                 f"{self.input_shape[1:]}], got {s.shape}")
        results = []
        for i in range(0, len(scenes), bs):
            chunk = scenes[i:i + bs]
            flat = np.concatenate(chunk)
            pad = self.batch_nodes - flat.shape[0]
            if pad:
                flat = np.concatenate(
                    [flat, np.zeros((pad,) + flat.shape[1:], np.float32)])
            out = self(flat)
            for j in range(len(chunk)):
                sl = slice(j * n, (j + 1) * n)
                results.append({k: v[sl] for k, v in out.items()})
        return results

    @classmethod
    def from_checkpoint(cls, cfg: ExperimentConfig,
                        checkpoint_dir: str) -> "Predictor":
        from mrp_gnn_tpu.checkpoint import CheckpointManager
        from mrp_gnn_tpu.data.pipeline import make_dataset
        from mrp_gnn_tpu.train import create_train_state
        sample = next(iter(make_dataset(cfg.data, "eval", shuffle=False)))
        state, _ = create_train_state(cfg, jax.random.PRNGKey(0), sample)
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
        return cls(cfg, restored.params)

    # --- ahead-of-time export -------------------------------------------

    def export_bytes(self, platforms=("cpu", "tpu")) -> bytes:
        """Serialize to portable StableHLO with params baked in."""
        from jax import export as jexport
        params = self._params
        fn = self._fn

        def infer(images):
            return fn(params, images)

        spec = jax.ShapeDtypeStruct(self.input_shape, jnp.float32)
        exp = jexport.export(jax.jit(infer), platforms=list(platforms))(spec)
        return exp.serialize()

    def throughput(self, iters: int = 20) -> dict:
        """Steady-state inference throughput (robot views/s) on this device."""
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(size=self.input_shape).astype(np.float32))
        out = self._fn(self._params, images)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self._fn(self._params, images)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        return {"batch_latency_s": dt,
                "views_per_s": self.batch_nodes / dt,
                "scenes_per_s": self.cfg.data.scenes_per_batch / dt}


def export_predictor(pred: Predictor, path: str,
                     platforms=("cpu", "tpu")) -> None:
    """Write the serialized artifact + a metadata sidecar JSON."""
    blob = pred.export_bytes(platforms)
    with open(path, "wb") as f:
        f.write(blob)
    meta = {"config": pred.cfg.name,
            "input_shape": list(pred.input_shape),
            "outputs": (["depth"] if pred.cfg.model.predict_depth else [])
            + (["seg"] if pred.cfg.model.num_seg_classes else []),
            "platforms": list(platforms)}
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_exported(path: str):
    """Load an exported artifact; returns callable(images) -> outputs dict."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def infer(images):
        return exp.call(jnp.asarray(images, jnp.float32))

    return infer


def main(argv=None):
    from mrp_gnn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--export", default=None, help="write StableHLO artifact")
    p.add_argument("--bench", action="store_true")
    args = p.parse_args(argv)

    cfg = get_config(args.config)
    pred = Predictor.from_checkpoint(cfg, args.checkpoint_dir)
    print(f"[serving] config={cfg.name} input={pred.input_shape} "
          f"backend={jax.default_backend()}")
    if args.export:
        export_predictor(pred, args.export)
        print(f"[serving] exported -> {args.export}")
    if args.bench:
        print(json.dumps(pred.throughput()))


if __name__ == "__main__":
    main()
