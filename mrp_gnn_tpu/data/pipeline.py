"""Batch pipeline: synthetic scenes -> padded static-shape node batches.

The reference uses a torch DataLoader collating [B, N, 3, H, W] scene tensors
(SURVEY.md section 3.1, reconstructed). Here batches are flattened to the
node axis ([V, H, W, 3], V = scenes * robots padded to max_nodes) to match
the GraphBatch layout, so the whole batch feeds the encoder as one conv
batch and shards over the mesh's data axis by node blocks.

Each batch dict: images [V,H,W,3] f32, depth [V,H,W] f32, seg [V,H,W] i32,
graph: GraphBatch. Shapes are identical across steps => one jit compile.
"""

from __future__ import annotations

import numpy as np

from mrp_gnn_tpu.config import DataConfig
from mrp_gnn_tpu.data.synthetic import SceneSpec, generate_scene
from mrp_gnn_tpu.graph import batch_homogeneous, scene_edges_for


class SceneDataset:
    """Deterministic map-style dataset of synthetic scenes."""

    def __init__(self, cfg: DataConfig, split: str = "train"):
        self.cfg = cfg
        self.split = split
        self.num_scenes = (cfg.num_train_scenes if split == "train"
                           else cfg.num_eval_scenes)
        # Disjoint seed streams per split.
        self._seed = cfg.seed * 2 + (0 if split == "train" else 1)
        self.spec = SceneSpec(
            num_robots=cfg.num_robots,
            image_size=cfg.image_size,
            num_classes=cfg.num_seg_classes,
            # constant parallax between adjacent robots regardless of team
            # size (robots spread along the baseline; see radius_edges).
            max_baseline=0.25 * max(cfg.num_robots - 1, 1),
            # cfg.mobility is in robot-index units; adjacent nominal slots
            # sit 0.25 m apart (the baseline spacing above).
            mobility=cfg.mobility * 0.25,
        )

        self._use_native = False
        if cfg.renderer in ("auto", "native"):
            from mrp_gnn_tpu.data import native
            self._use_native = native.is_available()
            if cfg.renderer == "native" and not self._use_native:
                raise RuntimeError("native renderer requested but the shared "
                                   "library could not be built/loaded")

    def __len__(self) -> int:
        return self.num_scenes

    def __repr__(self) -> str:
        # Stable (config-derived) repr: grain validates repr(data_source)
        # when restoring iterator state across processes.
        return f"SceneDataset(split={self.split!r}, cfg={self.cfg!r})"

    def __getitem__(self, idx: int) -> dict:
        rec = None
        if self._use_native:
            from mrp_gnn_tpu.data import native
            rec = native.render_scene_native(self.spec, self._seed, idx)
        if rec is None:
            rec = generate_scene(self.spec, self._seed, idx)
        if self.cfg.degraded_fraction > 0:
            rec = degrade_robots(rec, self.cfg.degraded_fraction,
                                 self._seed, idx)
        return rec

    def positions(self, idx: int) -> np.ndarray:
        """Scene camera positions WITHOUT rendering — lets a per-host
        sharded pipeline build the dynamic graph for scenes other hosts
        render (degradation never moves cameras, so no degrade replay)."""
        from mrp_gnn_tpu.data.synthetic import scene_positions
        return scene_positions(self.spec, self._seed, idx)


def degrade_robots(rec: dict, fraction: float, seed: int, idx: int) -> dict:
    """Corrupt a random subset of robots' cameras with heavy sensor noise.

    GT depth/seg are untouched: a degraded robot still has to predict its
    own view (mostly from teammates' messages), and teammates should learn
    to down-weight its outgoing messages (edge attention's job). At least
    one robot per scene stays clean. Deterministic per (seed, idx).
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed + 7, idx]))
    N = rec["images"].shape[0]
    bad = rng.uniform(size=N) < fraction
    if bad.all():
        bad[int(rng.integers(N))] = False
    if not bad.any():
        return rec
    images = rec["images"].copy()
    noise = rng.uniform(size=images[bad].shape).astype(np.float32)
    images[bad] = np.clip(0.15 * images[bad] + 0.85 * noise, 0.0, 1.0)
    return {**rec, "images": images}


def augment_scene(rec: dict, rng: np.random.Generator) -> dict:
    """Rig-consistent augmentation of one scene record.

    Horizontal flip mirrors every view AND reverses the robot order, so the
    parallax geometry stays coherent (flipping the world flips the camera
    baseline); index-distance graph topologies are invariant under the
    reversal. Photometric jitter: per-scene brightness/contrast on images
    only.
    """
    images, depth, seg = rec["images"], rec["depth"], rec["seg"]
    positions = rec.get("positions")
    if rng.uniform() < 0.5:
        images = images[::-1, :, ::-1]
        depth = depth[::-1, :, ::-1]
        seg = seg[::-1, :, ::-1]
        if positions is not None:
            # mirroring the world negates the camera baseline; robot order
            # reverses with it, so pairwise distances (and the dynamic
            # radius graph) are preserved.
            positions = (-positions[::-1]).copy()
    brightness = rng.uniform(0.85, 1.15)
    contrast = rng.uniform(0.9, 1.1)
    mean = images.mean(axis=(1, 2, 3), keepdims=True)
    images = np.clip((images - mean) * contrast + mean * brightness, 0.0, 1.0)
    out = {"images": np.ascontiguousarray(images.astype(np.float32)),
           "depth": np.ascontiguousarray(depth),
           "seg": np.ascontiguousarray(seg)}
    if positions is not None:
        out["positions"] = positions
    return out


def _pad_nodes(arr: np.ndarray, max_nodes: int) -> np.ndarray:
    pad = max_nodes - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])


class DynamicGraphBuilder:
    """Per-batch GraphBatch builder for dynamic topologies (mobility > 0).

    Shared by the builtin BatchIterator and the grain pipeline: derives the
    pinned capacities (full-connectivity upper bound) once, then builds a
    capacity-padded radius graph from each batch's robot positions — every
    batch shares one set of array shapes, so one jit compile serves the
    stream. Positions arrive in metres and are normalized to index units by
    the baseline spacing (see radius_edges / data/synthetic.py).
    """

    def __init__(self, cfg: DataConfig, max_nodes: int, spacing: float,
                 scenes_per_batch: int | None = None):
        from mrp_gnn_tpu.graph import batch_fully_connected
        if cfg.connectivity != "radius":
            raise ValueError("mobility > 0 needs connectivity='radius' "
                             "(dynamic topology is a communication-range "
                             "property)")
        n = cfg.num_robots
        self.num_robots = n
        self.scenes_per_batch = scenes_per_batch or cfg.scenes_per_batch
        self.spacing = spacing
        self.radius = float(cfg.comm_radius)
        # Capacity superset: edges can only be a subset of the full
        # per-scene graph, so the full batch's tile-pair plan length
        # bounds every dynamic plan.
        full = batch_fully_connected(self.scenes_per_batch, n,
                                     max_nodes=max_nodes)
        self.caps = dict(
            max_nodes=max_nodes,
            max_edges=self.scenes_per_batch * n * max(n - 1, 1),
            max_degree=max(n - 1, 1),
            # > 128-degree capacity graphs carry no square BSP plan (the
            # kernels' unroll cap). The row-expanded plan is NOT auto-
            # pinned either: ELL packing re-ranks a subgraph's neighbour
            # list, so a dynamic topology can touch MORE source tiles per
            # expanded row than the full graph does — the full-plan length
            # is not a sound capacity (docs/kernels.md). Dynamic high-
            # degree streams use the XLA gather path; API users with a
            # topology family they can bound may pass max_expanded_pairs
            # to batch_from_positions themselves (capacity violations
            # raise at plan build).
            max_bsp_pairs=(int(full.bsp_pair_dst.shape[0])
                           if full.bsp_pair_dst is not None else None),
            backend=getattr(cfg, "graph_builder", "auto"),
        )

    def nominal_graph(self):
        """First-batch/init graph with the stream's shapes: nominal
        (un-jittered) positions in index units."""
        from mrp_gnn_tpu.graph import batch_from_positions
        nominal = np.arange(self.num_robots, dtype=np.float64)
        return batch_from_positions([nominal] * self.scenes_per_batch,
                                    self.radius, **self.caps)

    def __call__(self, positions):
        """positions: [B, N] array or list of [N] arrays, in metres."""
        from mrp_gnn_tpu.graph import batch_from_positions
        pos = [np.asarray(p, np.float64) / self.spacing for p in positions]
        return batch_from_positions(pos, self.radius, **self.caps)



def _bounded_put(q, stop, item) -> bool:
    """Producer-side queue put that gives up once ``stop`` is set, so a
    pipeline producer thread can never stay blocked on a full queue after
    close(). Shared by every producer wrapper (TransformIterator,
    PrefetchIterator, train._MicrobatchStacker)."""
    import queue
    while True:
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            if stop.is_set():
                return False


class TransformIterator:
    """Applies a per-batch transform on a producer thread.

    Moves host-side per-batch work (dynamic graph builds, partition-plan
    attachment) OFF the training thread so it overlaps device compute, while
    preserving exact iterator-state checkpointing: the inner iterator's
    get_state() is captured alongside each batch, and get_state() here
    returns the snapshot of the batch most recently handed to the consumer —
    so a restore replays from exactly the next unseen batch even though the
    producer ran ahead.
    """

    def __init__(self, it, transform, depth: int = 2,
                 close_inner: bool = True):
        import queue
        import threading
        self._it = it
        self._tf = transform
        self._close_inner = close_inner  # False: caller owns the inner it
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._last_state = None
        self._done: BaseException | None = None
        self._has_state = hasattr(it, "get_state")
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        while not self._stop.is_set():
            try:
                batch = next(self._it)
                state = self._it.get_state() if self._has_state else None
                item = (state, self._tf(batch))
            except BaseException as e:  # noqa: BLE001 — relayed in __next__
                _bounded_put(self._q, self._stop, e)
                return
            _bounded_put(self._q, self._stop, item)

    def __iter__(self):
        return self

    def __next__(self):
        if self._done is not None:
            # The producer relayed a terminal exception and exited; repeated
            # calls must keep raising it (iterator contract) instead of
            # blocking forever on the now-empty queue.
            if isinstance(self._done, StopIteration):
                raise StopIteration from self._done
            raise self._done
        item = self._q.get()
        if isinstance(item, BaseException):
            self._done = item
            if isinstance(item, StopIteration):
                raise StopIteration from item
            raise item
        self._last_state, batch = item
        return batch

    def get_state(self):
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


class BatchIterator:
    """Yields padded node-flattened batches.

    Static topology (the default): homogeneous teams => the graph is
    identical every step and built once; only pixel data changes.
    Dynamic topology (cfg.mobility > 0, radius connectivity): robots drift
    per scene, so the communication graph is rebuilt per batch from scene
    positions — under pinned capacities (max_edges / max_degree /
    max_bsp_pairs sized for the full-connectivity worst case), so every
    batch still has identical array shapes and one jit compile serves the
    whole stream. The plan build runs on the pipeline thread (native C++
    builder when available — native/graphbuild.cc).
    """

    def __init__(self, dataset, scenes_per_batch: int,
                 max_nodes: int | None = None, max_edges: int | None = None,
                 shuffle: bool = True, seed: int = 0, drop_remainder: bool = True,
                 augment: bool = False, node_range: tuple | None = None):
        self.ds = dataset
        self.bs = scenes_per_batch
        self.augment = augment
        # Per-host data sharding (BASELINE.json:5 "without host
        # bottlenecks"): when set, this process renders ONLY the scenes
        # whose node rows intersect [lo, hi) of the global padded node axis
        # and yields node arrays of those rows (plus "node_range" in the
        # batch so shard_batch assembles the global array from per-process
        # shards). Graph topology stays global — positions come from the
        # render-free scene_positions replay for non-local scenes.
        self.node_range = node_range
        cfg = dataset.cfg
        n = cfg.num_robots
        edges = scene_edges_for(n, cfg.connectivity, cfg.comm_radius)
        self.graph = batch_homogeneous(
            scenes_per_batch, n, edges,
            max_nodes=max_nodes or scenes_per_batch * n,
            max_edges=max_edges or max(scenes_per_batch * edges.shape[1], 1),
        )
        self.max_nodes = self.graph.max_nodes
        if node_range is not None:
            import sys
            print(f"[pipeline] per-host shard: node rows "
                  f"[{node_range[0]}, {node_range[1]}) of {self.max_nodes}",
                  file=sys.stderr, flush=True)
        self._scene_edges = edges
        self._dynamic = getattr(cfg, "mobility", 0.0) > 0
        if self._dynamic:
            if not hasattr(dataset, "spec"):
                raise ValueError("dynamic topology needs the synthetic "
                                 "dataset (scene records carry robot "
                                 "positions)")
            self._graph_builder = DynamicGraphBuilder(
                cfg, self.max_nodes,
                spacing=dataset.spec.max_baseline / max(n - 1, 1),
                scenes_per_batch=scenes_per_batch)
            self.graph = self._graph_builder.nominal_graph()
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0
        self._skip_batches = 0

    @property
    def batches_per_epoch(self) -> int:
        return len(self.ds) // self.bs

    def fast_forward(self, n_batches: int) -> None:
        """Position the stream as if ``n_batches`` were already consumed —
        used on checkpoint resume so the data order continues where the run
        left off (shuffle order is a pure function of (seed, epoch))."""
        bpe = max(self.batches_per_epoch, 1)
        self._epoch = n_batches // bpe
        self._skip_batches = n_batches % bpe

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng([self.seed, self._epoch])
            rng.shuffle(order)
        self._epoch += 1
        skip, self._skip_batches = self._skip_batches, 0
        epoch = self._epoch - 1
        starts = list(range(skip * self.bs, len(order) - self.bs + 1, self.bs))
        tail = len(order) - (len(order) % self.bs)
        if not self.drop_remainder and tail < len(order) and tail >= skip * self.bs:
            starts.append(tail)  # partial final batch (padded + masked)
        if self.node_range is not None and tuple(self.node_range) != (
                0, self.max_nodes):
            n = self.ds.cfg.num_robots
            lo, hi = self.node_range
            for start in starts:
                yield self._local_batch(order[start:start + self.bs], epoch,
                                        lo, hi, n)
            return
        for start in starts:
            idxs = order[start:start + self.bs]
            scenes = [self.ds[int(i)] for i in idxs]
            if self.augment:
                scenes = [
                    augment_scene(s, np.random.default_rng(
                        [self.seed + 1, epoch, int(i)]))
                    for s, i in zip(scenes, idxs)]
            if self._dynamic:
                graph = self._graph_builder([s["positions"] for s in scenes])
            else:
                graph = self.graph
                if len(scenes) < self.bs:
                    # same static shapes, node_mask False on missing scenes
                    graph = batch_homogeneous(
                        len(scenes), self.ds.cfg.num_robots,
                        self._scene_edges, max_nodes=self.max_nodes,
                        max_edges=self.graph.max_edges)
            images = np.concatenate([s["images"] for s in scenes])
            depth = np.concatenate([s["depth"] for s in scenes])
            seg = np.concatenate([s["seg"] for s in scenes])
            yield {
                "images": _pad_nodes(images, self.max_nodes),
                "depth": _pad_nodes(depth, self.max_nodes),
                "seg": _pad_nodes(seg, self.max_nodes),
                "graph": graph,
            }

    def _local_batch(self, idxs, epoch, lo, hi, n):
        """One per-host batch: render ONLY the scenes whose node rows
        intersect [lo, hi); positions for the rest come from the
        render-free replay (SceneDataset.positions) so the dynamic graph
        stays globally consistent across hosts."""
        H, W = self.ds.cfg.image_size
        images = np.zeros((hi - lo, H, W, 3), np.float32)
        depth = np.zeros((hi - lo, H, W), np.float32)
        seg = np.zeros((hi - lo, H, W), np.int32)
        positions = []
        for bi, idx in enumerate(idxs):
            a, b = bi * n, (bi + 1) * n
            oa, ob = max(a, lo), min(b, hi)
            aug_rng = (np.random.default_rng([self.seed + 1, epoch, int(idx)])
                       if self.augment else None)
            if ob > oa:
                s = self.ds[int(idx)]
                if aug_rng is not None:
                    s = augment_scene(s, aug_rng)
                images[oa - lo:ob - lo] = s["images"][oa - a:ob - a]
                depth[oa - lo:ob - lo] = s["depth"][oa - a:ob - a]
                seg[oa - lo:ob - lo] = s["seg"][oa - a:ob - a]
                if self._dynamic:
                    positions.append(s["positions"])
            elif self._dynamic:
                pos = self.ds.positions(int(idx))
                # replay augment_scene's FIRST rng draw (the flip decision)
                if aug_rng is not None and aug_rng.uniform() < 0.5:
                    pos = (-pos[::-1]).copy()
                positions.append(pos)
        if self._dynamic:
            graph = self._graph_builder(positions)
        else:
            graph = self.graph
            if len(idxs) < self.bs:
                graph = batch_homogeneous(len(idxs), n, self._scene_edges,
                                          max_nodes=self.max_nodes,
                                          max_edges=self.graph.max_edges)
        return {"images": images, "depth": depth, "seg": seg,
                "graph": graph, "node_range": (lo, hi)}

    def repeat(self):
        while True:
            yield from self


class PrefetchIterator:
    """Overlaps host batch assembly with device compute.

    A daemon thread fills a bounded queue ``depth`` batches ahead; the
    training loop pops ready batches instead of rendering synchronously
    (the torch DataLoader-worker role of the reference — SURVEY.md 3.1 —
    without a fork per worker). Wraps the repeat() stream.
    """

    def __init__(self, batch_iter: "BatchIterator", depth: int = 2):
        import queue
        import threading
        self._it = batch_iter
        self.graph = batch_iter.graph
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        for batch in self._it.repeat():
            if self._stop.is_set() or not _bounded_put(
                    self._q, self._stop, batch):
                return

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            self._q.get_nowait()  # unblock the producer if it is waiting
        except Exception:
            pass
        self._thread.join(timeout=2.0)


def make_dataset(cfg: DataConfig, split: str = "train",
                 shuffle: bool | None = None,
                 node_range: tuple | None = None) -> BatchIterator:
    if cfg.dataset_root:
        from mrp_gnn_tpu.data.disk import DiskSceneDataset
        ds = DiskSceneDataset(cfg, split)
    else:
        ds = SceneDataset(cfg, split)
    return BatchIterator(
        ds, cfg.scenes_per_batch,
        max_nodes=cfg.max_nodes, max_edges=cfg.max_edges,
        shuffle=(split == "train") if shuffle is None else shuffle,
        seed=cfg.seed,
        # eval must see every scene: partial final batch padded + masked
        drop_remainder=split == "train",
        augment=cfg.augment and split == "train",
        node_range=node_range,
    )


def make_train_iterator(cfg: DataConfig, start_batch: int = 0,
                        data_state: str | None = None,
                        node_range: tuple | None = None):
    """Endless training stream; prefetched when cfg.prefetch > 0.

    start_batch: resume position in batches (usually the restored step
    count), so data order continues deterministically across restarts.
    data_state: serialized grain iterator state (CheckpointManager
    .latest_data_state()) — O(1) seek for the grain loader.
    """
    if cfg.loader == "grain":
        # grain shards RECORDS per process (ShardByJaxProcess), while
        # ParallelContext.shard_batch assumes every process holds the SAME
        # global batch (or explicit node_range rows) — mixing the two would
        # silently assemble a batch from different scenes per host (and,
        # with dynamic topology, inconsistent graphs/partition plans across
        # hosts). The builtin pipeline's node-range sharding is the
        # supported multi-process path; refuse the unsound combination.
        import jax
        if jax.process_count() > 1:
            raise ValueError(
                "loader='grain' is single-process only: grain shards records "
                "per process but the mesh assembly expects identical global "
                "batches per host. Use the builtin loader (loader='builtin') "
                "for multi-process runs — it shards scene rendering per host "
                "via node ranges (docs/data.md).")
        from mrp_gnn_tpu.data.grain_pipeline import make_grain_iterator
        it = make_grain_iterator(cfg, "train")
        if data_state is not None:
            it.set_state(data_state)  # exact O(1) stream seek
        else:
            for _ in range(start_batch):  # legacy skip-based resume
                next(it)
        return it
    it = make_dataset(cfg, "train", node_range=node_range)
    if start_batch:
        it.fast_forward(start_batch)
    if cfg.prefetch > 0:
        return PrefetchIterator(it, cfg.prefetch)
    return iter(it.repeat())
