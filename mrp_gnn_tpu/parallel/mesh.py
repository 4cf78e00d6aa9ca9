"""Device mesh construction and sharding helpers.

The reference has no distributed layer at all (SURVEY.md section 2.3 — single
process). This module is the new framework's mesh bring-up: a named
("data", "graph") mesh over however many devices exist, NamedShardings for
batches/params, and multi-host initialization.

Axes:
  data  — scene-graph batch shards (classic DP; XLA all-reduces grads).
  graph — edge partitions of the robot graph within one batch shard
          (boundary features move over ICI; see parallel/partition.py).
  model — tensor-parallel shards of conv/dense output channels
          (GSPMD-propagated; see parallel/tp.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_axis_size: int = 1, graph_axis_size: int = 1,
              model_axis_size: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    need = data_axis_size * graph_axis_size * model_axis_size
    if need > len(devs):
        raise ValueError(f"mesh needs {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(data_axis_size, graph_axis_size,
                                        model_axis_size)
    return Mesh(arr, ("data", "graph", "model"))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Node-major arrays ([V, ...]): nodes sharded over data x graph."""
    return NamedSharding(mesh, P(("data", "graph")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY.md section 3.5). No-op when single-host
    args are absent; used by launch scripts on pod slices."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
