from mrp_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from mrp_gnn_tpu.parallel.partition import (  # noqa: F401
    EdgePartitionPlan,
    partition_graph,
)
