"""Tensor parallelism: parameter sharding over the mesh "model" axis.

The reference has no tensor parallelism (SURVEY.md section 2.3 — single
process); this is the new framework's optional TP tier for large encoders/
decoders ("feature-encoder sharding", BASELINE.json:5). TPU-native mechanism:
annotate the weight pytree with NamedShardings over a "model" mesh axis and
let GSPMD propagate — XLA partitions every conv/matmul over its output
channels and inserts the all-gather / reduce-scatter collectives over ICI
itself. No manual collective code, composes freely with the data axis (DP)
and the graph axis (edge partitioning) on the same mesh.

Sharding rule (shape-based so params and the optimizer's mirrored moments
get identical layouts): shard the trailing dimension — the output-feature
axis of conv HWIO / dense (in, out) kernels and of their bias/scale vectors —
over "model" whenever it divides evenly; everything else (scalars,
non-divisible leaves) is replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def leaf_partition_spec(shape: tuple, model_axis_size: int) -> P:
    """PartitionSpec for one parameter leaf under the trailing-dim rule."""
    if model_axis_size <= 1 or not shape:
        return P()
    last = shape[-1]
    if last % model_axis_size != 0 or last < model_axis_size * 2:
        return P()
    return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``state`` (TrainState or params tree).

    Works on the whole train state: optimizer moments share parameter shapes
    so the shape-based rule keeps them co-located with their parameters;
    scalars (step, schedule counts) come out replicated.
    """
    model_ax = mesh.shape.get(MODEL_AXIS, 1)

    def shard_of(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, leaf_partition_spec(tuple(shape), model_ax))

    return jax.tree_util.tree_map(shard_of, state)
