"""Backend dispatch for the graph edge ops: XLA reference vs Pallas kernels.

``get_ops("xla")`` returns the oracle implementations; ``get_ops("pallas")``
returns the Pallas TPU kernels (falling back per-op to XLA where a kernel is
not applicable). The fusion layer takes the backend from
ParallelConfig.ops_impl so models are backend-agnostic (SURVEY.md section 7
step 5: "Swap into the fusion layer behind a flag").
"""

from __future__ import annotations

import dataclasses
from typing import Callable


@dataclasses.dataclass(frozen=True)
class EdgeOps:
    sddmm: Callable
    segment_softmax: Callable
    spmm: Callable
    segment_mean_agg: Callable
    # Segment-max (the tier's third reduction): edge-list form.
    segment_max_agg: Callable | None = None
    # Dense fast path for block-diagonal scene batches (None = unsupported;
    # callers fall back to the ELL / edge-list ops).
    block_fused_attention: Callable | None = None
    block_mean_agg: Callable | None = None
    block_max_agg: Callable | None = None
    # ELL sparse path for irregular graphs with a padded neighbour-list view:
    # (q, k, values, graph) -> msg and (values, graph) -> msg.
    ell_attention: Callable | None = None
    ell_mean: Callable | None = None
    ell_max: Callable | None = None
    # Backend tag ("xla" | "pallas") — lets composite paths (e.g. the
    # partitioned fusion's local aggregate) pick backend-specific kernels.
    impl: str = "xla"


def _compose_ell_attention(sddmm_fn, softmax_fn, spmm_fn):
    import numpy as np

    def ell_attention(q, k, values, graph):
        logits = sddmm_fn(q, k, graph.ell_src, graph.ell_mask)
        logits = logits / np.sqrt(q.shape[-1])
        alpha = softmax_fn(logits, graph.ell_mask)
        return spmm_fn(alpha, values, graph.ell_src, graph.ell_mask)

    return ell_attention


def _xla_ops() -> EdgeOps:
    from mrp_gnn_tpu.ops import reference as R

    def ell_mean(values, graph):
        ones = graph.ell_mask.astype(values.dtype)
        return R.ell_aggregate(ones, values, graph.ell_src, graph.ell_mask,
                               "mean")

    def ell_max(values, graph):
        return R.ell_aggregate(None, values, graph.ell_src, graph.ell_mask,
                               "max")

    return EdgeOps(R.sddmm, R.segment_softmax, R.spmm, R.segment_mean_agg,
                   R.segment_max_agg,
                   R.block_fused_attention, R.block_mean_agg, R.block_max_agg,
                   _compose_ell_attention(R.ell_sddmm, R.ell_softmax,
                                          lambda a, v, s, m:
                                          R.ell_aggregate(a, v, s, m, "sum")),
                   ell_mean, ell_max)


def _pallas_ops() -> EdgeOps:
    from mrp_gnn_tpu.ops import reference as R
    from mrp_gnn_tpu.ops import pallas_bsp as B
    from mrp_gnn_tpu.ops import pallas_edge as P
    from mrp_gnn_tpu.ops import pallas_ell as PE

    xla_ell_attention = _compose_ell_attention(
        R.ell_sddmm, R.ell_softmax,
        lambda a, v, s, m: R.ell_aggregate(a, v, s, m, "sum"))

    def ell_attention(q, k, values, graph):
        # One-pass tile-block-sparse fused kernel when the batch carries a
        # pair plan (sequential whole-tile DMAs + one-hot MXU selection +
        # online softmax, alpha never visits HBM). Without a plan, the XLA
        # ELL gather path wins at every scale over the round-1 per-row-DMA
        # kernels (26M vs 14M edges/s — descriptor-latency-bound;
        # BASELINE.md), so the kernels in pallas_ell stay available for
        # benchmarking but are not the dispatch path.
        if B.supports(graph):
            return B.bsp_attention_fused(q, k, values, graph)
        if B.supports_expanded(graph):
            # > 128 in-neighbours: row-expanded rectangular plan keeps the
            # same kernels streaming whole tiles; the ONE-PASS form builds
            # the selection once per pair (docs/kernels.md).
            return B.expanded_attention_fused(q, k, values, graph)
        return xla_ell_attention(q, k, values, graph)

    def block_fused_attention(q, k, values, graph):
        # The dense block league is XLA's on this hardware AT EVERY SCALE:
        # tiny graphs are dominated by kernel fixed costs (chip A/B:
        # five_robot_attention trains 44% faster on xla), and at saturated-
        # bus swarm scale a controlled 8-round interleaved A/B measured the
        # Pallas block kernel at 0.94x +/- 0.05 of the XLA einsum path
        # (scripts/dense_league_ab.py, BASELINE.md round 4) — the einsum
        # formulation is already at the memory roofline and a kernel cannot
        # beat a saturated bus. P.block_fused_attention stays available for
        # benchmarking (bench.py calls it directly); dispatch routes XLA.
        return R.block_fused_attention(q, k, values, graph)

    def ell_mean(values, graph):
        if B.supports(graph):
            return B.bsp_mean(values, graph)
        if B.supports_expanded(graph):
            return B.expanded_mean(values, graph)
        ones = graph.ell_mask.astype(values.dtype)
        return R.ell_aggregate(ones, values, graph.ell_src, graph.ell_mask,
                               "mean")  # XLA gather beats per-row DMA

    def ell_max(values, graph):
        return PE.ell_max(values, graph.ell_src, graph.ell_mask)

    return EdgeOps(P.sddmm, P.segment_softmax, P.spmm, R.segment_mean_agg,
                   R.segment_max_agg,
                   block_fused_attention, R.block_mean_agg, R.block_max_agg,
                   ell_attention, ell_mean, ell_max, impl="pallas")


_BACKENDS = {"xla": _xla_ops, "pallas": _pallas_ops}


def resolve_impl(impl: str) -> str:
    """"auto" picks the winning backend for the platform: the Pallas
    tile-block-sparse kernels on TPU (they own the sparse league on chip —
    BASELINE.md), the XLA reference ops on CPU (where Pallas only has slow
    interpret mode)."""
    if impl != "auto":
        return impl
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def get_ops(impl: str = "xla") -> EdgeOps:
    impl = resolve_impl(impl)
    if impl not in _BACKENDS:
        raise ValueError(f"unknown ops impl {impl!r}; choose from "
                         f"{sorted(_BACKENDS)} or 'auto'")
    return _BACKENDS[impl]()
