from mrp_gnn_tpu.data.pipeline import make_dataset  # noqa: F401
