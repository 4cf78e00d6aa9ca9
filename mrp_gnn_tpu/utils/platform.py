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
    if env:
        import jax
        try:
            if jax.config.jax_platforms != env:
                jax.config.update("jax_platforms", env)
        except RuntimeError:
            pass  # backends already initialized; too late to switch
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first axon-TPU compiles take
    minutes; repeat runs of the same program should not)."""
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/mrp_gnn_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even quick compiles: CLI processes are short-lived
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
