"""TPU-native multi-robot collaborative-perception GNN framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ``xjh19971/multi-robot-perception-gnn-1`` (see /root/repo/SURVEY.md;
the reference mount was empty at survey time, so parity targets are anchored
to the driver contract in BASELINE.json and a torch-CPU twin oracle):

- per-robot CNN encoders over RGB views (SURVEY.md section 1 L3a),
- robot-graph message passing with learned edge attention implemented as
  SDDMM -> segment-softmax -> SpMM over a static-shape padded edge list
  (SURVEY.md section 3.3), with Pallas TPU kernels for the hot ops,
- dense depth / semantic-segmentation decoder heads (SURVEY.md L3c),
- mesh-parallel training: data parallelism plus edge-partitioned graphs with
  overlapped boundary feature exchange across devices (SURVEY.md section 2.3).
"""

__version__ = "0.1.0"

from mrp_gnn_tpu.graph import GraphBatch  # noqa: F401
