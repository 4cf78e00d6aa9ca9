"""Overlap evidence for the boundary exchange (BASELINE.json:5), at the TPU
compiler's scheduled-HLO level.

Single-chip machines cannot *execute* an 8-device mesh, but the attached TPU
topology descriptor lets us AOT-compile the partitioned fusion step for 8
real TPU devices and inspect the compiler's schedule (is_scheduled=true).
With async collective-permute enabled, the value exchange's -start ops are
issued before the local SDDMM/softmax chain and the matching -done ops land
after it — the local aggregation executes inside the ICI transfer window.

Usage: python scripts/aot_overlap_hlo.py [--out /tmp/partitioned.hlo]
Writes the scheduled module and prints the overlap-window analysis
(mrp_gnn_tpu.benchmark.hlo_overlap_window). Numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/mrp_partitioned_tpu.hlo")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--feature_dim", type=int, default=2048)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from mrp_gnn_tpu.benchmark import _weak_scaling_batch, hlo_overlap_window
    from mrp_gnn_tpu.ops import dispatch
    from mrp_gnn_tpu.parallel.fused import make_partitioned_edge_fusion
    from mrp_gnn_tpu.parallel.partition import partition_graph

    topo = topologies.get_topology_desc(platform="tpu")
    devs = topo.devices
    if len(devs) < args.devices:
        sys.exit(f"topology exposes {len(devs)} devices, need {args.devices}")
    devs = devs[: args.devices]
    print(f"AOT target: {len(devs)} TPU devices ({devs[0].device_kind})")

    ops = dispatch.get_ops("xla")
    gb = _weak_scaling_batch("radius", args.devices, 8, 2)
    plan = partition_graph(gb, args.devices)
    V = gb.max_nodes
    qs = jax.ShapeDtypeStruct((V, 64), jnp.float32)
    vs = jax.ShapeDtypeStruct((V, args.feature_dim), jnp.float32)
    mesh = Mesh(np.array(devs).reshape(1, args.devices), ("data", "graph"))
    fn = make_partitioned_edge_fusion(mesh, plan)
    lowered = jax.jit(
        lambda q, k, v: fn(ops, "attention", q, k, v, gb)).lower(qs, qs, vs)
    # async collective-permute: accepted via compiler_options (the local
    # XLA_FLAGS parser does not know TPU-side flags on this machine)
    txt = lowered.compile(compiler_options={
        "xla_enable_async_collective_permute": "true"}).as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    info = hlo_overlap_window(txt)
    print(f"scheduled module -> {args.out}")
    print("starts:", txt.count("collective-permute-start"),
          "dones:", txt.count("collective-permute-done"),
          "sync:", txt.count(" collective-permute("))
    print(info)


if __name__ == "__main__":
    main()
