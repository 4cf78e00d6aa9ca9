"""Test configuration: force CPU with 8 virtual devices.

CI runs on CPU (SURVEY.md section 4.2): the single axon TPU chip has multi-
minute first-compiles, and the sharding tests need 8 devices. Env vars must
be set before jax initializes its backends, hence module scope here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
