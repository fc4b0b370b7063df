"""NaN-aware Dice metrics (reference utils/dice_coefficient.py).

Pure jnp; NaN marks classes absent from the ground truth so that
``jnp.nanmean`` aggregation skips them, exactly like the reference
(dice_coefficient.py:51)."""

from __future__ import annotations

import jax.numpy as jnp


def multilabel_dice(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-class Dice for boolean tensors of shape (B, C, *spatial*).

    Returns (B, C) float32 with NaN where the GT class is empty
    (reference dice_coefficient.py:30-53)."""
    assert y_hat.shape == y.shape, f"Shape mismatch: {y_hat.shape} != {y.shape}"
    assert y_hat.ndim > 2
    B, C = y.shape[:2]
    y_hat_f = y_hat.reshape(B, C, -1).astype(jnp.float32)
    y_f = y.reshape(B, C, -1).astype(jnp.float32)

    intersection = jnp.sum(y_hat_f * y_f, axis=2)
    cardinality = jnp.sum(y_hat_f + y_f, axis=2)
    dice = 2 * intersection / (cardinality + 1e-8)

    gt_present = jnp.any(y.reshape(B, C, -1), axis=2)
    return jnp.where(gt_present, dice, jnp.nan)


def multiclass_dice(y_hat: jnp.ndarray, y: jnp.ndarray, max_label: int) -> jnp.ndarray:
    """Per-class Dice over integer label maps (B, ...), ignoring class 0
    (reference dice_coefficient.py:5-26).  Returns (B, max_label)."""
    assert y_hat.shape == y.shape, f"Shape mismatch: {y_hat.shape} != {y.shape}"
    assert y_hat.ndim > 1
    B = y.shape[0]
    labels = jnp.arange(1, max_label + 1).reshape(1, -1, 1)
    y_hat_oh = y_hat.reshape(B, 1, -1) == labels
    y_oh = y.reshape(B, 1, -1) == labels
    return multilabel_dice(y_hat_oh, y_oh)


def jaccard_to_dice(j: jnp.ndarray) -> jnp.ndarray:
    """IoU -> Dice, ``2J/(1+J)`` (reference seg_refinement.py:114)."""
    return 2 * j / (1 + j)
