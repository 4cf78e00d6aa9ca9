"""Mask-aware training losses.

The reference trains with a depth regression loss plus segmentation
cross-entropy with multi-task weighting (SURVEY.md section 2.1 "Losses",
reconstructed — reference mount empty; loss family per paper
arXiv:2201.01760). All losses mask out padded robot-view nodes and invalid
depth pixels so padding never contributes gradient.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def masked_depth_l1(pred: jnp.ndarray, target: jnp.ndarray,
                    node_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 over valid pixels. pred/target: [V, H, W]; node_mask: [V]."""
    valid = (target > 0) & node_mask[:, None, None]
    err = jnp.abs(pred - target) * valid
    return err.sum() / jnp.maximum(valid.sum(), 1)


def masked_depth_silog(pred: jnp.ndarray, target: jnp.ndarray,
                       node_mask: jnp.ndarray, lam: float = 0.5) -> jnp.ndarray:
    """Scale-invariant log loss (Eigen et al.) over valid pixels."""
    valid = (target > 0) & node_mask[:, None, None]
    d = (jnp.log(jnp.maximum(pred, 1e-6)) - jnp.log(jnp.maximum(target, 1e-6)))
    d = d * valid
    n = jnp.maximum(valid.sum(), 1)
    return (d ** 2).sum() / n - lam * (d.sum() / n) ** 2


def masked_depth_berhu(pred: jnp.ndarray, target: jnp.ndarray,
                       node_mask: jnp.ndarray) -> jnp.ndarray:
    """Reverse-Huber (berHu) loss: L1 near zero, quadratic in the tail, with
    the switch point c = 0.2 * max residual per batch (Laina et al.)."""
    valid = (target > 0) & node_mask[:, None, None]
    d = jnp.abs(pred - target) * valid
    c = jnp.maximum(0.2 * jnp.max(d), 1e-6)
    loss = jnp.where(d <= c, d, (d ** 2 + c ** 2) / (2 * c))
    return (loss * valid).sum() / jnp.maximum(valid.sum(), 1)


DEPTH_LOSSES = {
    "l1": masked_depth_l1,
    "berhu": masked_depth_berhu,
    "silog": masked_depth_silog,
}


def masked_seg_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                  node_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over valid pixels. logits: [V, H, W, K]; labels int [V, H, W]."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    valid = node_mask[:, None, None].astype(ce.dtype)
    valid = jnp.broadcast_to(valid, ce.shape)
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)


def total_loss(outputs: dict, batch: dict, node_mask: jnp.ndarray,
               depth_weight: float = 1.0, seg_weight: float = 1.0,
               depth_loss: str = "l1") -> tuple:
    """Weighted multi-task loss; returns (loss, per-term dict)."""
    terms = {}
    loss = 0.0
    if "depth" in outputs:
        fn = DEPTH_LOSSES[depth_loss]
        terms[f"depth_{depth_loss}"] = fn(outputs["depth"], batch["depth"],
                                          node_mask)
        loss = loss + depth_weight * terms[f"depth_{depth_loss}"]
    if "seg_logits" in outputs:
        terms["seg_ce"] = masked_seg_ce(outputs["seg_logits"], batch["seg"],
                                        node_mask)
        loss = loss + seg_weight * terms["seg_ce"]
    terms["total"] = loss
    return loss, terms
