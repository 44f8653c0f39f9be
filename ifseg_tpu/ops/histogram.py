"""Per-class area histograms for segmentation metrics.

Matches the reference's ``torch.histc(x, bins=C, min=0, max=C-1)`` usage on
integer class ids (criterions/seg_criterion.py:349-362): a plain bincount over
[0, C).  ``weights`` support masked accumulation so ragged original-resolution
eval can run at a padded static shape (SURVEY.md §7 "ragged eval" hard part).
"""

import jax.numpy as jnp


def class_histogram(ids, num_classes: int, weights=None):
    """Counts of each class id in [0, num_classes); ids outside are dropped.

    Formulated as a one-hot comparison + reduction rather than a scatter-add:
    TPU scatters serialize, while (N, C) compare + sum is pure VPU work."""
    ids = ids.reshape(-1)
    valid = (ids >= 0) & (ids < num_classes)
    w = valid.astype(jnp.float32)
    if weights is not None:
        w = w * weights.reshape(-1).astype(jnp.float32)
    onehot = ids[:, None] == jnp.arange(num_classes, dtype=ids.dtype)[None, :]
    return jnp.sum(onehot.astype(jnp.float32) * w[:, None], axis=0)


def confusion_areas(pred, target, num_classes: int, valid=None):
    """(area_intersect, area_pred, area_label, area_union) per class.

    Reference math (seg_criterion.py:349-362): intersect counts predictions that
    equal the target, pred/label are marginal histograms, union = pred+label-int.
    ``valid`` masks out padded/ignored pixels (weight 0).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    w = None if valid is None else valid.reshape(-1).astype(jnp.float32)
    match = (pred == target).astype(jnp.float32)
    mw = match if w is None else match * w
    area_intersect = class_histogram(pred, num_classes, weights=mw)
    area_pred = class_histogram(pred, num_classes, weights=w)
    area_label = class_histogram(target, num_classes, weights=w)
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_pred, area_label, area_union
