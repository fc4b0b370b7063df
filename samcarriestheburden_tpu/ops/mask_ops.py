"""Mask-geometry ops (reference segment_anything/utils/amg.py).

All functions here are pure array math and jittable/vmappable — the reference
computes them with torch on GPU; on TPU they fuse into surrounding XLA
programs.  Data-dependent *filtering* is left to the caller (pad + validity
masks inside jit, host-side finalisation outside)."""

from __future__ import annotations

import math
from itertools import product
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def calculate_stability_score(masks: jnp.ndarray, mask_threshold: float,
                              threshold_offset: float) -> jnp.ndarray:
    """IoU between high- and low-thresholded versions of mask logits
    (reference amg.py:156-176).  ``masks``: (..., H, W) logits."""
    intersections = jnp.sum(masks > (mask_threshold + threshold_offset),
                            axis=(-1, -2), dtype=jnp.int32)
    unions = jnp.sum(masks > (mask_threshold - threshold_offset),
                     axis=(-1, -2), dtype=jnp.int32)
    return intersections / unions


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """XYXY boxes around boolean masks; [0,0,0,0] for empty masks
    (reference amg.py:303-346).  (..., H, W) -> (..., 4) int32."""
    h, w = masks.shape[-2:]
    masks = masks.astype(bool)

    in_height = jnp.any(masks, axis=-1)  # (..., H)
    h_coords = in_height * jnp.arange(h, dtype=jnp.int32)
    bottom = jnp.max(h_coords, axis=-1)
    top = jnp.min(h_coords + h * (~in_height), axis=-1)

    in_width = jnp.any(masks, axis=-2)  # (..., W)
    w_coords = in_width * jnp.arange(w, dtype=jnp.int32)
    right = jnp.max(w_coords, axis=-1)
    left = jnp.min(w_coords + w * (~in_width), axis=-1)

    empty = (right < left) | (bottom < top)
    box = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, box).astype(jnp.int32)


def is_box_near_crop_edge(boxes: jnp.ndarray, crop_box, orig_box,
                          atol: float = 20.0) -> jnp.ndarray:
    """True for boxes near the crop edge but not near the image edge
    (reference amg.py:78-88).  ``boxes``: (N, 4) in crop frame."""
    crop = jnp.asarray(crop_box, jnp.float32)
    orig = jnp.asarray(orig_box, jnp.float32)
    boxes = uncrop_boxes_xyxy(boxes, crop_box).astype(jnp.float32)
    near_crop = jnp.abs(boxes - crop[None]) <= atol
    near_image = jnp.abs(boxes - orig[None]) <= atol
    return jnp.any(near_crop & ~near_image, axis=1)


def box_xyxy_to_xywh(box_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> xywh (reference amg.py:91-95)."""
    x0, y0, x1, y1 = jnp.moveaxis(box_xyxy, -1, 0)
    return jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n², 2) xy grid evenly spaced in [0,1]² (reference amg.py:179-186)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    xx = np.tile(pts[None, :], (n_per_side, 1))
    yy = np.tile(pts[:, None], (1, n_per_side))
    return np.stack([xx, yy], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    """Point grids per crop layer (reference amg.py:189-197)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float) -> Tuple[List[List[int]], List[int]]:
    """Layered crop boxes, (2^i)² per layer i (reference amg.py:200-234)."""
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: jnp.ndarray, crop_box) -> jnp.ndarray:
    """Shift crop-frame boxes into the original frame (reference amg.py:237-243)."""
    x0, y0 = crop_box[0], crop_box[1]
    offset = jnp.asarray([x0, y0, x0, y0], boxes.dtype)
    shape = (1,) * (boxes.ndim - 1) + (4,)
    return boxes + offset.reshape(shape)


def uncrop_points(points: jnp.ndarray, crop_box) -> jnp.ndarray:
    """Shift crop-frame points into the original frame (reference amg.py:246-252)."""
    offset = jnp.asarray(crop_box[:2], points.dtype)
    shape = (1,) * (points.ndim - 1) + (2,)
    return points + offset.reshape(shape)


def uncrop_masks(masks: jnp.ndarray, crop_box, orig_h: int, orig_w: int) -> jnp.ndarray:
    """Zero-pad crop-frame masks back to (orig_h, orig_w)
    (reference amg.py:255-264).  ``crop_box`` must be static ints."""
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad_x, pad_y = orig_w - (x1 - x0), orig_h - (y1 - y0)
    cfg = [(0, 0)] * (masks.ndim - 2) + [(y0, pad_y - y0), (x0, pad_x - x0)]
    return jnp.pad(masks, cfg)


def batch_iterator(batch_size: int, *args):
    """Yield equal-length slices of each arg (reference amg.py:98-104)."""
    assert len(args) > 0 and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [a[b * batch_size:(b + 1) * batch_size] for a in args]


@jax.jit
def packbits_device(masks: jnp.ndarray) -> jnp.ndarray:
    """Pack a boolean mask's last axis into uint8 on DEVICE (little-endian
    bit order, `np.unpackbits(..., bitorder='little')`-compatible).

    Fetching raw bool masks costs 1 byte/pixel over the host link — through
    a remote-TPU tunnel that dominates the refinement sweep's wall time; the
    packed transfer is 8x smaller.  Last axis must be a multiple of 8."""
    *lead, w = masks.shape
    assert w % 8 == 0, w
    b = masks.reshape(*lead, w // 8, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint8)


def unpackbits_host(packed: np.ndarray, w: int) -> np.ndarray:
    """Inverse of :func:`packbits_device` on the host; returns bool (..., w)."""
    flat = np.unpackbits(np.asarray(packed), axis=-1, bitorder="little")
    return flat[..., :w].astype(bool)
