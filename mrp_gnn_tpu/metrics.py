"""Evaluation metrics: depth RMSE / AbsRel / delta-accuracy and seg mIoU.

Same metric set the reference's eval script reports (SURVEY.md section 3.2;
BASELINE.json:2). Implemented as pure accumulate/finalize pairs so a jitted
eval step can fold batches into a running pytree.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_metrics_accumulate(pred: jnp.ndarray, target: jnp.ndarray,
                             node_mask: jnp.ndarray) -> dict:
    """Sufficient statistics for depth metrics over one batch.

    pred/target: [V, H, W]; node_mask: [V].
    """
    valid = (target > 0) & node_mask[:, None, None]
    n = valid.sum()
    diff = (pred - target) * valid
    ratio = jnp.where(valid, jnp.maximum(pred / jnp.maximum(target, 1e-6),
                                         target / jnp.maximum(pred, 1e-6)), jnp.inf)
    return {
        "n": n,
        "sq_err": (diff ** 2).sum(),
        "abs_rel": jnp.where(valid, jnp.abs(diff) / jnp.maximum(target, 1e-6), 0.0).sum(),
        "d1": (ratio < 1.25).sum(),
        "d2": (ratio < 1.25 ** 2).sum(),
        "d3": (ratio < 1.25 ** 3).sum(),
    }


def depth_metrics_finalize(acc: dict) -> dict:
    n = jnp.maximum(acc["n"], 1)
    return {
        "rmse": jnp.sqrt(acc["sq_err"] / n),
        "abs_rel": acc["abs_rel"] / n,
        "delta1": acc["d1"] / n,
        "delta2": acc["d2"] / n,
        "delta3": acc["d3"] / n,
    }


def seg_confusion_accumulate(logits: jnp.ndarray, labels: jnp.ndarray,
                             node_mask: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[K, K] confusion-matrix counts (rows = truth, cols = prediction)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = jnp.broadcast_to(node_mask[:, None, None], labels.shape)
    idx = labels * num_classes + pred
    counts = jnp.bincount(idx.reshape(-1), weights=valid.reshape(-1).astype(jnp.float32),
                          length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def seg_miou(confusion: jnp.ndarray) -> jnp.ndarray:
    """Mean IoU over classes present in the ground truth."""
    tp = jnp.diag(confusion)
    union = confusion.sum(0) + confusion.sum(1) - tp
    present = confusion.sum(1) > 0
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1), 0.0)
    return jnp.where(present, iou, 0.0).sum() / jnp.maximum(present.sum(), 1)


def seg_per_class_iou(confusion: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU; classes absent from the ground truth report -1."""
    tp = jnp.diag(confusion)
    union = confusion.sum(0) + confusion.sum(1) - tp
    present = confusion.sum(1) > 0
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1), 0.0)
    return jnp.where(present, iou, -1.0)


def tree_add(a, b):
    import jax
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)
