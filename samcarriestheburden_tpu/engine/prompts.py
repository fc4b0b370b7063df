"""Automatic prompt extraction from predicted masks
(reference segment_anything/utils/prompt_utils.py).

The reference loops over classes in Python and returns ragged per-class
``Prompt`` objects.  The TPU-native core (:func:`extract_prompt_arrays`) is a
single fused computation over all C classes at once — centroids and bboxes are
masked reductions, never ``nonzero`` — yielding *static-shape* arrays plus
validity flags, ready for a vmapped decoder.  A thin :class:`PromptExtractor`
preserves the reference's list-of-Prompt API on top.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samcarriestheburden_tpu.ops.mask_ops import batched_mask_to_box
from samcarriestheburden_tpu.ops.resize import (
    get_preprocess_shape, pad_bottom_right, resize_bilinear)


@dataclass
class Prompt:
    """Per-class prompt (reference prompt_utils.py:11-18); coordinates (x, y)."""

    class_idx: int
    img_size: Tuple[int, int]
    pos_seeds: Optional[np.ndarray] = None
    neg_seeds: Optional[np.ndarray] = None
    box: Optional[np.ndarray] = None
    mask_logits: Optional[np.ndarray] = None


# ---------------------------------------------------------------------------
# array core
# ---------------------------------------------------------------------------


@jax.jit
def extract_prompt_arrays(pred_mask: jnp.ndarray) -> dict:
    """All-class prompt extraction from a (C, H, W) boolean mask.

    Returns dict of static-shape arrays:
      pos_seeds (C, 2) float xy   — rounded centroid over non-overlapping area
      pos_valid (C,) bool         — reference skips classes with no seeds (:125)
      boxes     (C, 4) float xyxy — tight bbox over the full class mask
      box_valid (C,) bool
    """
    mask = pred_mask.astype(bool)
    c, h, w = mask.shape
    non_overlap = jnp.sum(mask, axis=0) < 2  # (H, W) (reference :65-67)
    seed_mask = mask & non_overlap[None]

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    n = jnp.sum(seed_mask, axis=(1, 2)).astype(jnp.float32)
    cy = jnp.sum(seed_mask * ys[None, :, None], axis=(1, 2)) / jnp.maximum(n, 1)
    cx = jnp.sum(seed_mask * xs[None, None, :], axis=(1, 2)) / jnp.maximum(n, 1)
    pos = jnp.stack([jnp.round(cx), jnp.round(cy)], axis=-1)  # (C, 2) xy

    boxes = batched_mask_to_box(mask).astype(jnp.float32)
    return {
        "pos_seeds": pos,
        "pos_valid": n > 0,
        "boxes": boxes,
        "box_valid": jnp.any(mask, axis=(1, 2)),
    }


def neg_seed_table(pos_seeds: jnp.ndarray, pos_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Negative seeds for class i = every *other* class's positive seed in
    ascending class order (reference :132-133), as a static (C, C-1, 2) table
    + (C, C-1) validity.  With all classes valid this reproduces the
    reference's token layout exactly; missing classes become not-a-point pads
    (SAM's own padding convention) instead of shrinking the tensor."""
    c = pos_seeds.shape[0]
    idx = np.asarray([[j for j in range(c) if j != i] for i in range(c)])
    table = pos_seeds[idx]          # (C, C-1, 2)
    valid = pos_valid[idx]          # (C, C-1)
    return table, valid


@partial(jax.jit, static_argnames=("eps",))
def compute_logits_from_mask(class_mask: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """(H, W) bool -> (1, 256, 256) SAM mask-input logits
    (reference :70-110, micro-sam adaptation): inverse-sigmoid of eps-clamped
    mask, antialiased resize-longest-side to 256, zero-pad."""
    h, w = class_mask.shape
    logit_hi = float(np.log((1 - eps) / eps))
    logits = jnp.where(class_mask, logit_hi, -logit_hi).astype(jnp.float32)
    newh, neww = get_preprocess_shape(h, w, 256)
    logits = resize_bilinear(logits, (newh, neww), antialias=True)
    logits = pad_bottom_right(logits, (256, 256))
    return logits[None]


@jax.jit
def extract_selecting_prompt_arrays(prob_mask: jnp.ndarray) -> dict:
    """SAMSelectingPromptExtractor core (reference :187-220): single pixel of
    max / min probability per class as pos / neg seed."""
    c, h, w = prob_mask.shape
    flat = prob_mask.reshape(c, -1)

    def to_xy(idx):
        return jnp.stack([(idx % w).astype(jnp.float32),
                          (idx // w).astype(jnp.float32)], axis=-1)

    pos = to_xy(jnp.argmax(flat, axis=1))
    neg = to_xy(jnp.argmin(flat, axis=1))
    return {
        "pos_seeds": pos,
        "neg_seeds": neg,
        "valid": jnp.any(prob_mask > 0.5, axis=(1, 2)),
    }


# ---------------------------------------------------------------------------
# API-parity wrappers
# ---------------------------------------------------------------------------


class PromptExtractor:
    """Reference-compatible extractor over a (C, H, W) boolean mask
    (prompt_utils.py:21-143)."""

    def __init__(self, pred_mask):
        pred_mask = np.asarray(pred_mask)
        assert pred_mask.ndim == 3, "pred_mask should be 3D tensor of shape (C, H, W)"
        assert pred_mask.dtype == bool, "pred_mask should be boolean tensor"
        self.pred_mask = pred_mask
        self.num_classes = pred_mask.shape[0]
        self._arrays = jax.tree.map(np.asarray, extract_prompt_arrays(pred_mask))

    @property
    def seeds(self):
        a = self._arrays
        return [a["pos_seeds"][i].round().astype(np.int32)[None]
                if a["pos_valid"][i] else None
                for i in range(self.num_classes)]

    def extract(self, seeds: bool = True, boxes: bool = True,
                mask: bool = False) -> List[Prompt]:
        a = self._arrays
        img_size = tuple(self.pred_mask.shape[-2:])
        all_seeds = self.seeds
        prompts = []
        for i in range(self.num_classes):
            if all_seeds[i] is None:  # reference skips seedless classes (:125)
                continue
            p = Prompt(i, img_size)
            if seeds:
                p.pos_seeds = all_seeds[i]
                others = [all_seeds[j] for j in range(self.num_classes)
                          if j != i and all_seeds[j] is not None]
                p.neg_seeds = np.concatenate(others) if others else np.zeros((0, 2), np.int32)
            if boxes:
                p.box = a["boxes"][i].round().astype(np.int32)
            if mask:
                p.mask_logits = np.asarray(compute_logits_from_mask(self.pred_mask[i]))
            prompts.append(p)
        return prompts


class SAMSelectingPromptExtractor(PromptExtractor):
    """Reference prompt_utils.py:187-220."""

    def __init__(self, pred_mask):
        pred_mask = np.asarray(pred_mask, np.float32)
        super().__init__(pred_mask > 0.5)
        self.float_pred_mask = pred_mask
        self._sel = jax.tree.map(np.asarray,
                                 extract_selecting_prompt_arrays(pred_mask))

    def extract(self, mask: bool = True) -> List[Prompt]:
        img_size = tuple(self.pred_mask.shape[-2:])
        prompts = []
        for i in range(self.num_classes):
            if not self.float_pred_mask[i].any():
                continue
            p = Prompt(i, img_size)
            p.pos_seeds = self._sel["pos_seeds"][i][None]
            p.neg_seeds = self._sel["neg_seeds"][i][None]
            if mask:
                p.mask_logits = np.asarray(compute_logits_from_mask(self.pred_mask[i]))
            prompts.append(p)
        return prompts
