"""Jittable greedy box NMS.

The reference uses ``torchvision.ops.batched_nms`` (automatic_mask_generator.py:9,251).
A data-dependent keep-list does not fit XLA's static shapes, so this
implementation returns a boolean *keep mask* computed by a fixed-length
sequential scan over score-sorted boxes — the standard TPU-friendly
formulation (O(N²) IoU matrix + lax.fori_loop)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) and (M, 4) xyxy boxes -> (N, M)."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS; returns a boolean keep mask aligned with the input order.

    ``valid`` marks padded entries as never-kept (static-shape idiom).
    Matches torchvision NMS semantics: strictly-greater-than-threshold
    suppression in descending score order, ties broken by input order.
    """
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)

    order = jnp.argsort(-scores, stable=True)
    sorted_boxes = boxes[order]
    iou = box_iou(sorted_boxes, sorted_boxes)
    suppress = iou > iou_threshold

    def body(i, keep):
        # i suppressed by an earlier kept box? then not kept.
        earlier = (jnp.arange(n) < i) & keep
        keep_i = ~jnp.any(earlier & suppress[:, i])
        return keep.at[i].set(keep[i] & keep_i)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones(n, dtype=bool))
    if valid is not None:
        keep_sorted = keep_sorted & (scores[order] > -jnp.inf)
    # scatter back to input order
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     category_ids: jnp.ndarray, iou_threshold: float,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-category NMS via the coordinate-offset trick
    (torchvision ``batched_nms`` semantics)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    max_coord = jnp.max(boxes) + 1
    offsets = category_ids.astype(jnp.float32)[:, None] * max_coord
    return nms_mask(boxes + offsets, scores, iou_threshold, valid)
