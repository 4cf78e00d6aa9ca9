"""Full multi-robot perception network: encoder -> graph fusion -> decoders.

Assembles the model for all 5 contract configs (BASELINE.json:6-12) from
ModelConfig. Forward signature: (images [V, H, W, 3], GraphBatch) -> dict of
dense predictions, V = padded robot-view nodes of the whole scene batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrp_gnn_tpu.config import ModelConfig
from mrp_gnn_tpu.graph import GraphBatch
from mrp_gnn_tpu.models.decoder import Decoder, DepthHead, SegHead
from mrp_gnn_tpu.models.encoder import Encoder
from mrp_gnn_tpu.models.fusion import GraphFusionLayer


class MultiRobotPerceptionNet(nn.Module):
    config: ModelConfig
    ops_impl: str = "xla"
    edge_fusion_fn: object = None  # injected by the partitioned path

    @nn.compact
    def __call__(self, images: jnp.ndarray, graph: GraphBatch) -> dict:
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        x = images.astype(dtype)

        with jax.named_scope("encoder"):
            skips, bottleneck = Encoder(cfg.encoder_channels, cfg.norm_groups,
                                        dtype, name="encoder")(x)
        out = {"bottleneck": bottleneck}

        fused = bottleneck
        if cfg.fusion != "none":
            for i in range(cfg.num_fusion_layers):
                fused = GraphFusionLayer(
                    aggregation=cfg.fusion,
                    attention_dim=cfg.attention_dim,
                    attention_heads=cfg.attention_heads,
                    norm_groups=cfg.norm_groups,
                    dtype=dtype,
                    ops_impl=self.ops_impl,
                    edge_fusion_fn=self.edge_fusion_fn,
                    name=f"fusion{i}",
                )(fused, graph)
        out["fused"] = fused

        with jax.named_scope("decoder"):
            dec = Decoder(cfg.encoder_channels, cfg.norm_groups, dtype,
                          name="decoder")(skips, fused)
        out["decoder"] = dec

        if cfg.predict_depth:
            out["depth"] = DepthHead(cfg.min_depth, cfg.max_depth, dtype,
                                     name="depth_head")(dec).astype(jnp.float32)
        if cfg.num_seg_classes > 0:
            out["seg_logits"] = SegHead(cfg.num_seg_classes, dtype,
                                        name="seg_head")(dec).astype(jnp.float32)
        return out
