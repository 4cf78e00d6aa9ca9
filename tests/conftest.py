"""Test configuration: force CPU with 8 virtual devices.

CI runs on CPU (SURVEY.md section 4.2): the single axon TPU chip has multi-
minute first-compiles, and the sharding tests need 8 devices.

Note this machine's sitecustomize pre-imports jax and presets
JAX_PLATFORMS=axon, so env vars alone are too late — the platform must be
switched via jax.config after import. XLA_FLAGS still works as long as no
backend has been initialized yet.
"""

import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() >= 8, (
    f"tests need 8 virtual CPU devices, got {jax.device_count()} "
    f"on {jax.default_backend()}"
)
