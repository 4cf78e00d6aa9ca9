"""Debug-mode utilities: NaN trapping and checked index bounds.

SURVEY.md section 5 ("Race detection / sanitizers"): JAX's functional model
removes data races by construction; the remaining hazards are NaNs and
out-of-bounds edge indices into padded node arrays. This module provides:

- enable_debug(): turns on jax_debug_nans so any NaN in a jitted program
  raises at the producing op;
- checked(fn): wraps a function with jax.experimental.checkify for explicit
  NaN/OOB-index error accumulation (usable inside jit, unlike debug_nans);
- validate_graph(graph): host-side structural validation of a GraphBatch.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def enable_debug() -> None:
    import jax
    jax.config.update("jax_debug_nans", True)


def disable_debug() -> None:
    import jax
    jax.config.update("jax_debug_nans", False)


def checked(fn: Callable) -> Callable:
    """checkify-wrap fn; the returned callable raises on NaN / OOB index.

    Usage: loss = checked(jax.jit(train_step))(state, batch)
    """
    import jax
    from jax.experimental import checkify

    ck = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def run(*args, **kw):
        err, out = ck(*args, **kw)
        err.throw()
        return out

    return run


def validate_graph(graph) -> None:
    """Host-side GraphBatch invariants; raises AssertionError with context."""
    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    em = np.asarray(graph.edge_mask)
    nm = np.asarray(graph.node_mask)
    V = graph.max_nodes
    assert src.shape == dst.shape == em.shape
    assert (src >= 0).all() and (src < V).all(), "edge_src out of range"
    assert (dst >= 0).all() and (dst < V).all(), "edge_dst out of range"
    assert nm[src[em]].all(), "valid edge from padded source node"
    assert nm[dst[em]].all(), "valid edge into padded destination node"
    d = dst[em]
    assert (np.diff(d) >= 0).all(), "valid edges not dst-sorted"
    if graph.ell_src is not None:
        ell_m = np.asarray(graph.ell_mask)
        assert int(ell_m.sum()) == int(em.sum()), "ELL/edge-list edge count mismatch"
    if graph.scene_stride:
        assert V % graph.scene_stride == 0, "block stride does not tile nodes"
