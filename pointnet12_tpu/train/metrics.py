"""Accuracy / IoU metrics with the reference's definitions.

Reference behavior (SURVEY.md §2 utils, §3.3): classification reports
overall and per-class accuracy; segmentation accumulates a confusion matrix
over the whole eval set and reports overall accuracy, per-class IoU
(intersection / union of prediction+target) and their mean (mIoU).

All ops are jit-safe: the confusion matrix is a one-hot matmul (MXU), so the
whole eval step stays on-device and only the final (C, C) matrix crosses to
host.
"""

from typing import Optional

import jax.numpy as jnp


def accuracy(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    pred = jnp.argmax(log_probs, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(correct)


def confusion_matrix(
    pred: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``(C, C)`` counts with rows = true class, cols = predicted class."""
    pred = pred.reshape(-1)
    labels = labels.reshape(-1).astype(jnp.int32)
    onehot_t = jnp.eye(num_classes, dtype=jnp.float32)[labels]  # (P, C)
    onehot_p = jnp.eye(num_classes, dtype=jnp.float32)[pred]  # (P, C)
    if mask is not None:
        onehot_t = onehot_t * mask.reshape(-1, 1).astype(jnp.float32)
    return jnp.einsum("pc,pd->cd", onehot_t, onehot_p)


def iou_from_confusion(cm: jnp.ndarray, ignore_class: Optional[int] = None):
    """Per-class IoU, mIoU (over classes present), and overall accuracy.

    ``ignore_class`` (e.g. Semantic-KITTI's unlabeled class 0) is excluded
    from the mIoU mean and the overall accuracy, matching the reference
    lineage's treatment of unlabeled points.
    """
    tp = jnp.diag(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    union = tp + fp + fn
    iou = tp / jnp.maximum(union, 1e-12)
    present = union > 0  # classes appearing in target or prediction
    valid = jnp.ones_like(tp, dtype=bool)
    if ignore_class is not None:
        valid = valid.at[ignore_class].set(False)
        present = present & valid
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(
        jnp.sum(present), 1
    )
    overall_acc = jnp.sum(jnp.where(valid, tp, 0.0)) / jnp.maximum(
        jnp.sum(jnp.where(valid[:, None], cm, 0.0)), 1e-12
    )
    return iou, miou, overall_acc
