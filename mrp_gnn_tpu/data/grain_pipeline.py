"""Grain-backed input pipeline (optional alternative loader).

The builtin BatchIterator (data/pipeline.py) assembles batches on a single
prefetch thread; for expensive renderers or disk datasets, `grain` provides
multi-PROCESS workers, per-record determinism, and multi-host sharding
(grain.ShardByJaxProcess) behind the same batch schema. Select with
``DataConfig.loader = "grain"`` (+ ``loader_workers``).

Batches are identical in structure to the builtin pipeline: images
[V, H, W, 3], depth [V, H, W], seg [V, H, W], graph: GraphBatch — same
static shapes, same jitted program.
"""

from __future__ import annotations

import numpy as np

from mrp_gnn_tpu.config import DataConfig
from mrp_gnn_tpu.graph import batch_homogeneous, scene_edges_for


class _Collate:
    """grain MapTransform: list of scene records -> one padded node batch.

    Dynamic topology (cfg.mobility > 0): the per-scene robot positions are
    passed through un-padded ([B, N]) so the host-side iterator (after the
    grain worker boundary — GraphBatch pytrees must not cross process
    forks) can build the per-batch radius graph from them."""

    def __init__(self, cfg: DataConfig):
        n = cfg.num_robots
        edges = scene_edges_for(n, cfg.connectivity, cfg.comm_radius)
        self.graph = batch_homogeneous(
            cfg.scenes_per_batch, n, edges,
            max_nodes=cfg.max_nodes or cfg.scenes_per_batch * n,
            max_edges=cfg.max_edges
            or max(cfg.scenes_per_batch * edges.shape[1], 1))
        self.max_nodes = self.graph.max_nodes
        self.dynamic = getattr(cfg, "mobility", 0.0) > 0

    def _pad(self, arr):
        pad = self.max_nodes - arr.shape[0]
        if pad <= 0:
            return arr
        return np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])

    def __call__(self, batch) -> dict:
        def flat(x):
            # grain.Batch stacks records -> [B, N, ...]; flatten to nodes
            arr = np.asarray(x)
            return self._pad(arr.reshape((-1,) + arr.shape[2:]))

        if isinstance(batch, dict):
            out = {k: flat(batch[k]) for k in ("images", "depth", "seg")}
            if self.dynamic:
                out["positions"] = np.asarray(batch["positions"])  # [B, N]
        else:  # list of records (older grain Batch semantics)
            out = {
                "images": self._pad(np.concatenate(
                    [s["images"] for s in batch])),
                "depth": self._pad(np.concatenate(
                    [s["depth"] for s in batch])),
                "seg": self._pad(np.concatenate([s["seg"] for s in batch])),
            }
            if self.dynamic:
                out["positions"] = np.stack([s["positions"] for s in batch])
        return out


def make_grain_iterator(cfg: DataConfig, split: str = "train",
                        shuffle: bool | None = None,
                        num_epochs: int | None = None,
                        workers: int | None = None):
    """Endless (or num_epochs-bounded) batch iterator backed by grain.

    Yields the same dicts as the builtin pipeline; the constant GraphBatch
    is attached host-side after grain's worker boundary (pytrees with jax
    arrays must not cross process forks).
    """
    import grain.python as gp

    from mrp_gnn_tpu.data.pipeline import SceneDataset
    if cfg.dataset_root:
        from mrp_gnn_tpu.data.disk import DiskSceneDataset
        ds = DiskSceneDataset(cfg, split)
    else:
        ds = SceneDataset(cfg, split)

    collate = _Collate(cfg)
    graph = collate.graph
    graph_builder = None
    if collate.dynamic:
        from mrp_gnn_tpu.data.pipeline import DynamicGraphBuilder
        if not hasattr(ds, "spec"):
            raise ValueError("dynamic topology needs the synthetic dataset "
                             "(scene records carry robot positions)")
        graph_builder = DynamicGraphBuilder(
            cfg, collate.max_nodes,
            spacing=ds.spec.max_baseline / max(cfg.num_robots - 1, 1))
        graph = graph_builder.nominal_graph()

    class _CollateTransform(gp.MapTransform):
        def map(self, element):
            return collate(element)

    sampler = gp.IndexSampler(
        num_records=len(ds),
        shuffle=(split == "train") if shuffle is None else shuffle,
        seed=cfg.seed,
        num_epochs=num_epochs,
        shard_options=gp.ShardByJaxProcess(drop_remainder=True),
    )
    loader = gp.DataLoader(
        data_source=ds,
        sampler=sampler,
        operations=[
            gp.Batch(batch_size=cfg.scenes_per_batch, drop_remainder=True),
            _CollateTransform(),
        ],
        worker_count=workers if workers is not None else cfg.loader_workers,
    )

    return GrainBatchIterator(loader, graph, graph_builder)


class GrainBatchIterator:
    """Batch stream over a grain DataLoader that exposes grain's O(1)
    iterator checkpointing: get_state()/set_state() serialize the exact
    stream position, so checkpoint resume seeks instead of rendering and
    discarding every skipped batch (train.py passes the state through
    CheckpointManager)."""

    def __init__(self, loader, graph, graph_builder=None):
        self.graph = graph
        self._it = iter(loader)
        self._graph_builder = graph_builder

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        batch = next(self._it)
        if self._graph_builder is not None:
            # dynamic topology: per-batch radius graph from the positions
            # collated through the worker boundary (train.py wraps this
            # iterator in a TransformIterator so the build runs off the
            # training thread)
            batch["graph"] = self._graph_builder(batch.pop("positions"))
        else:
            batch["graph"] = self.graph
        return batch

    def get_state(self) -> str:
        state = self._it.get_state()
        return state.decode() if isinstance(state, bytes) else str(state)

    def set_state(self, state: str) -> None:
        self._it.set_state(state.encode())
