"""Graph message-passing ops: XLA reference implementations and Pallas TPU kernels.

Dispatch between backends with :func:`mrp_gnn_tpu.ops.dispatch.get_ops`.
"""

from mrp_gnn_tpu.ops.reference import (  # noqa: F401
    sddmm,
    segment_softmax,
    spmm,
    segment_mean_agg,
)
