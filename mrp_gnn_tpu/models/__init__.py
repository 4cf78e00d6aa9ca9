from mrp_gnn_tpu.models.net import MultiRobotPerceptionNet  # noqa: F401
