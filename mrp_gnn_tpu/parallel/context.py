"""Parallel training context: mesh + partition plan + shardings, wired together.

Config 5 (swarm_partitioned, BASELINE.json:11) trains with node arrays
block-sharded over a ("data", "graph") mesh and the fusion edge block
replaced by the shard_map'd partitioned version. This module assembles those
pieces from an ExperimentConfig; everything else in the trainer is unchanged
(the same jitted step runs single-device when the mesh is 1x1).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mrp_gnn_tpu.config import ExperimentConfig
from mrp_gnn_tpu.graph import GraphBatch
from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
from mrp_gnn_tpu.parallel.mesh import make_mesh
from mrp_gnn_tpu.parallel.partition import EdgePartitionPlan, partition_graph


def _put(value, sharding: NamedSharding):
    """device_put that also works on multi-process meshes.

    With >1 process a host value cannot be device_put onto non-addressable
    devices; build the global array from per-host callbacks instead (every
    process holds the same full value — the deterministic pipeline renders
    identically from the shared seed)."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    import numpy as np
    arr = np.asarray(value)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


@dataclasses.dataclass(frozen=True)
class ParallelContext:
    mesh: Mesh
    plan: Optional[EdgePartitionPlan]
    edge_fusion_fn: Optional[Callable]
    node_sharding: NamedSharding      # [V, ...] arrays
    replicated: NamedSharding
    spatial: bool = False             # "model" axis shards image H instead
    # Dynamic topology (mobility > 0) + graph partitioning: capacities that
    # pin per-batch plan shapes, and the replica count for stacking. None for
    # static topology.
    dyn_caps: Optional[object] = None
    num_replicas: int = 1

    def attach_plan(self, graph: GraphBatch) -> GraphBatch:
        """Attach the per-batch partition plan (dynamic topology only)."""
        if self.dyn_caps is None or graph.partition_plan is not None:
            return graph
        from mrp_gnn_tpu.parallel.partition import partition_batch
        nshards = self.plan.num_shards if self.plan else 1
        return dataclasses.replace(
            graph, partition_plan=partition_batch(
                graph, self.num_replicas, nshards, self.dyn_caps))

    def shard_state(self, state):
        """Place a TrainState: params/moments TP-sharded over "model"
        (replicated when the axis is trivial or used spatially), scalars
        replicated."""
        if self.spatial:
            shardings = jax.tree_util.tree_map(lambda _: self.replicated,
                                               state)
        else:
            from mrp_gnn_tpu.parallel.tp import state_shardings
            shardings = state_shardings(state, self.mesh)
        return jax.tree_util.tree_map(_put, state, shardings)

    def local_node_range(self, V: int):
        """Contiguous [lo, hi) of the global node axis addressed by THIS
        process's devices under node_sharding — the rows its data pipeline
        must materialize. None when the union is not contiguous (then the
        pipeline must fall back to full-batch rendering)."""
        if jax.process_count() == 1:
            return (0, V)
        idx_map = self.node_sharding.addressable_devices_indices_map((V,))
        spans = []
        for idx in idx_map.values():
            sl = idx[0]
            spans.append((sl.start or 0,
                          V if sl.stop is None else sl.stop))
        lo = min(s for s, _ in spans)
        hi = max(e for _, e in spans)
        pos = lo
        for s, e in sorted(spans):
            if s > pos:
                return None  # hole: non-contiguous addressable rows
            pos = max(pos, e)
        return (lo, hi) if pos == hi else None

    def shard_batch(self, batch: dict, leading_accum: bool = False) -> dict:
        """Place a host batch onto the mesh with node-axis sharding.

        leading_accum: arrays carry a leading microbatch axis (gradient
        accumulation) — the node axis is then axis 1.

        Batches carrying "node_range" hold ONLY this process's node rows
        (per-host sharded pipeline); the global array is assembled from the
        per-process shards via make_array_from_process_local_data — no
        process ever materializes the full batch.
        """
        import jax.numpy as jnp
        node = ("data", "graph")
        node_range = batch.get("node_range")
        # global node count from the graph (node_mask's trailing axis also
        # handles stacked per-microbatch graphs)
        V_global = int(np.asarray(batch["graph"].node_mask).shape[-1])
        out = {}
        for k, v in batch.items():
            if k in ("node_range", "_placed"):
                continue
            if k == "graph":
                v = self.attach_plan(v)  # dynamic topology: per-batch plan
                out[k] = jax.tree_util.tree_map(
                    lambda x: _put(x, self.replicated), v)
                continue
            # spec: [accum?, V(node), H(spatial?), ...rest]
            spec = [node]
            if self.spatial and np.ndim(v) >= (3 + int(leading_accum)):
                spec.append("model")
            if leading_accum:
                spec.insert(0, None)
            sharding = NamedSharding(self.mesh, P(*spec))
            if node_range is not None and jax.process_count() > 1:
                axis = 1 if leading_accum else 0
                local = np.asarray(v)
                gshape = (local.shape[:axis] + (V_global,)
                          + local.shape[axis + 1:])
                out[k] = jax.make_array_from_process_local_data(
                    sharding, local, gshape)
            else:
                out[k] = _put(jnp.asarray(v), sharding)
        return out


def make_parallel_context(cfg: ExperimentConfig,
                          replica_graph: Optional[GraphBatch]
                          ) -> Optional[ParallelContext]:
    """Build mesh/plan/edge_fn for cfg; None when the mesh is trivial.

    ``replica_graph`` is the per-data-replica GraphBatch (topology is
    identical across data shards; node slots are replica-local).
    """
    pc = cfg.parallel
    model_ax = getattr(pc, "model_axis_size", 1)
    if pc.data_axis_size * pc.graph_axis_size * model_ax <= 1:
        return None
    mesh = make_mesh(pc.data_axis_size, pc.graph_axis_size, model_ax)
    dyn_caps = None
    if pc.graph_axis_size > 1:
        if getattr(cfg.data, "mobility", 0.0) > 0:
            # Dynamic topology: the compiled structure (shapes + halo rings)
            # comes from the CAPACITY plan — the full-connectivity replica
            # graph, a componentwise upper bound for every radius topology
            # on the same scene layout. Per-batch plans are built against
            # these capacities and attached to each batch's GraphBatch
            # (attach_plan / partition.partition_batch).
            from mrp_gnn_tpu.graph import batch_fully_connected
            from mrp_gnn_tpu.parallel.partition import capacities_of
            d = cfg.data
            if d.scenes_per_batch % pc.data_axis_size:
                raise ValueError(
                    f"scenes_per_batch={d.scenes_per_batch} not divisible "
                    f"by data_axis_size={pc.data_axis_size}")
            scenes_rep = d.scenes_per_batch // pc.data_axis_size
            full = batch_fully_connected(scenes_rep, d.num_robots)
            plan = partition_graph(full, pc.graph_axis_size)
            dyn_caps = capacities_of(plan)
            xp_pairs = getattr(pc, "expanded_plan_pairs", 0)
            if xp_pairs:
                # >128-degree dynamic streams: keep the local aggregate on
                # the row-expanded Pallas kernels (ParallelConfig doc).
                dyn_caps = dataclasses.replace(dyn_caps, xp_pairs=xp_pairs)
            edge_fn = make_partitioned_edge_fusion(
                mesh, plan,
                exchange=getattr(pc, "boundary_exchange", "boundary"),
                overlap=pc.overlap_boundary_exchange,
                dynamic=True)
        else:
            plan = partition_graph(replica_graph, pc.graph_axis_size)
            edge_fn = make_partitioned_edge_fusion(
                mesh, plan,
                exchange=getattr(pc, "boundary_exchange", "boundary"),
                overlap=pc.overlap_boundary_exchange)
    else:
        # DP/TP-only mesh: the single-device edge block is correct per shard.
        plan, edge_fn = None, None
    return ParallelContext(
        mesh=mesh,
        plan=plan,
        edge_fusion_fn=edge_fn,
        node_sharding=NamedSharding(mesh, P(("data", "graph"))),
        replicated=NamedSharding(mesh, P()),
        spatial=getattr(pc, "spatial_sharding", False),
        dyn_caps=dyn_caps,
        num_replicas=pc.data_axis_size,
    )
