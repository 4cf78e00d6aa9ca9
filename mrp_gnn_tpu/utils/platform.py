"""Platform-selection fixup for CLI entry points.

This machine's sitecustomize registers the experimental axon TPU plugin and
force-sets jax_platforms="axon,cpu", overriding the JAX_PLATFORMS env var.
CLI entry points call apply_platform_env() so the standard env semantics
(JAX_PLATFORMS=cpu python -m mrp_gnn_tpu.train ...) keep working; it is a
no-op when the env var is unset or backends are already initialized.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax
    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except RuntimeError:
        pass  # backends already initialized; too late to switch
