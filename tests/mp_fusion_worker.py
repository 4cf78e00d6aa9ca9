"""Worker for the multi-process smoke test: partitioned fusion over 2
processes x 4 virtual CPU devices = 8 global devices.

Usage: python tests/mp_fusion_worker.py <process_id> <num_processes> <port>
Prints "WORKER_OK <max_err>" on success (process 0 checks vs the
unpartitioned oracle).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"

from mrp_gnn_tpu.parallel.launch import initialize  # noqa: E402

initialize(f"localhost:{port}", num_processes=nproc, process_id=pid,
           local_device_count=4)

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from mrp_gnn_tpu.graph import batch_fully_connected  # noqa: E402
from mrp_gnn_tpu.models.fusion import default_edge_fusion  # noqa: E402
from mrp_gnn_tpu.ops import dispatch  # noqa: E402
from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion  # noqa: E402
from mrp_gnn_tpu.parallel.launch import host_replicated_array  # noqa: E402
from mrp_gnn_tpu.parallel.partition import partition_graph  # noqa: E402

assert jax.device_count() == nproc * 4, jax.device_count()

P_graph = jax.device_count()
gb = batch_fully_connected(2, 8)  # 16 nodes over 8 shards -> boundary edges
V, D, dk = gb.max_nodes, 32, 8
rng = np.random.default_rng(0)
q = rng.normal(size=(V, dk)).astype(np.float32)
k = rng.normal(size=(V, dk)).astype(np.float32)
v = rng.normal(size=(V, D)).astype(np.float32)

mesh = Mesh(np.array(jax.devices()).reshape(1, P_graph), ("data", "graph"))
plan = partition_graph(gb, P_graph)
edge_fn = make_partitioned_edge_fusion(mesh, plan)
ops = dispatch.get_ops("xla")

spec = P(("data", "graph"))
qg = host_replicated_array(mesh, spec, q)
kg = host_replicated_array(mesh, spec, k)
vg = host_replicated_array(mesh, spec, v)
# plan arrays are identical on every process -> valid replicated jit inputs;
# shard_map's in_specs slice them logically.

out = jax.jit(lambda q, k, v: edge_fn(ops, "attention", q, k, v, gb))(qg, kg, vg)

from jax.experimental import multihost_utils  # noqa: E402

out_full = multihost_utils.process_allgather(out, tiled=True)

import dataclasses  # noqa: E402

gb_sparse = dataclasses.replace(gb, scene_adj=None, scene_stride=0)
expected = np.asarray(default_edge_fusion(
    ops, "attention", jax.numpy.asarray(q), jax.numpy.asarray(k),
    jax.numpy.asarray(v), gb_sparse))
err = float(np.abs(np.asarray(out_full) - expected).max())
assert err < 1e-4, f"mismatch {err}"
print(f"WORKER_OK {err:.2e}", flush=True)
