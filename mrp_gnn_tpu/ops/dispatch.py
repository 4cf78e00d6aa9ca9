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
    # Dense fast path for block-diagonal scene batches (None = unsupported;
    # callers fall back to the edge-list ops above).
    block_fused_attention: Callable | None = None
    block_mean_agg: Callable | None = None


def _xla_ops() -> EdgeOps:
    from mrp_gnn_tpu.ops import reference as R
    return EdgeOps(R.sddmm, R.segment_softmax, R.spmm, R.segment_mean_agg,
                   R.block_fused_attention, R.block_mean_agg)


def _pallas_ops() -> EdgeOps:
    from mrp_gnn_tpu.ops import reference as R
    from mrp_gnn_tpu.ops import pallas_edge as P
    return EdgeOps(P.sddmm, P.segment_softmax, P.spmm, R.segment_mean_agg,
                   P.block_fused_attention, R.block_mean_agg)


_BACKENDS = {"xla": _xla_ops, "pallas": _pallas_ops}


def get_ops(impl: str = "xla") -> EdgeOps:
    if impl not in _BACKENDS:
        raise ValueError(f"unknown ops impl {impl!r}; choose from {sorted(_BACKENDS)}")
    return _BACKENDS[impl]()
