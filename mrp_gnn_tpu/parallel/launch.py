"""Multi-process (multi-host) bring-up helpers.

On a real TPU pod slice each host runs one process and
``jax.distributed.initialize`` wires them into one global mesh (SURVEY.md
section 3.5). The same path is exercised on localhost CPU processes in CI
(tests/test_multiprocess.py) using gloo collectives.

Typical pod usage:
    python -m mrp_gnn_tpu.train --config swarm_partitioned \
        --coordinator <host0>:1234 --num_processes 4 --process_id $ID
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """Bring up jax.distributed; no-op when coordinator is None.

    On CPU, forces the given per-process virtual device count and selects
    gloo for cross-process collectives (must run before jax backends init).
    """
    if coordinator is None:
        return
    if local_device_count:
        prev = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in prev:
            os.environ["XLA_FLAGS"] = (
                f"{prev} --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        from mrp_gnn_tpu.utils.platform import apply_platform_env
        apply_platform_env()
    if jax.config.jax_platforms and "cpu" in str(jax.config.jax_platforms):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def host_replicated_array(mesh, spec, host_value: np.ndarray):
    """Build a global sharded array from the same host-replicated value on
    every process (each process contributes its addressable shards)."""
    import jax
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda idx: host_value[idx])
