"""Resize and coordinate transforms.

Reproduces the numerics the reference gets from
``segment_anything/utils/transforms.py`` (ResizeLongestSide) and
``torch.nn.functional.interpolate``:

* ``get_preprocess_shape`` — the +0.5 rounding rule (transforms.py:93-102).
* bilinear resize with half-pixel centers (== torch ``align_corners=False``),
  optionally antialiased (== torch ``antialias=True`` / PIL-style triangle
  filter) via :func:`jax.image.resize`.
* ``nearest`` in both torch conventions: the legacy asymmetric one
  (``mode='nearest'``) and the half-pixel one (``mode='nearest-exact'``),
  implemented as explicit gathers so they match torch bit-exactly.

All functions are jittable and batched; sizes are static Python ints, as XLA
requires.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_preprocess_shape(oldh: int, oldw: int, long_side_length: int) -> Tuple[int, int]:
    """Output (H, W) after resizing the longest side to ``long_side_length``.

    Matches reference transforms.py:93-102 (int(x + 0.5) rounding).
    """
    scale = long_side_length * 1.0 / max(oldh, oldw)
    newh, neww = oldh * scale, oldw * scale
    return int(newh + 0.5), int(neww + 0.5)


def resize_bilinear(image: jnp.ndarray, out_hw: Tuple[int, int], *,
                    antialias: bool = False) -> jnp.ndarray:
    """Bilinear resize of the trailing-but-channel spatial dims.

    ``image`` is (..., H, W) — channel-agnostic; the last two axes are resized.
    Half-pixel-center sampling == torch ``align_corners=False``.
    """
    out_shape = image.shape[:-2] + tuple(out_hw)
    return jax.image.resize(image.astype(jnp.float32), out_shape, method="linear",
                            antialias=antialias)


def _nearest_indices(out_size: int, in_size: int, exact: bool) -> jnp.ndarray:
    scale = in_size / out_size
    i = jnp.arange(out_size, dtype=jnp.float32)
    if exact:  # torch 'nearest-exact': half-pixel centers
        src = jnp.floor((i + 0.5) * scale)
    else:  # torch legacy 'nearest': asymmetric
        src = jnp.floor(i * scale)
    return jnp.clip(src.astype(jnp.int32), 0, in_size - 1)


def resize_nearest(image: jnp.ndarray, out_hw: Tuple[int, int], *,
                   exact: bool = True) -> jnp.ndarray:
    """Nearest-neighbour resize of the last two axes.

    ``exact=True`` matches torch ``mode='nearest-exact'`` (used by the
    reference at seg_refinement.py:111); ``exact=False`` matches legacy
    ``mode='nearest'`` (used at seg_grazpedwri_dataset.py:176).
    """
    h_idx = _nearest_indices(out_hw[0], image.shape[-2], exact)
    w_idx = _nearest_indices(out_hw[1], image.shape[-1], exact)
    return image[..., h_idx, :][..., :, w_idx]


def apply_coords(coords: jnp.ndarray, original_size: Tuple[int, int],
                 target_length: int) -> jnp.ndarray:
    """Scale (..., 2) xy coords from ``original_size`` (H, W) into the
    resized-longest-side frame (reference transforms.py:33-45)."""
    old_h, old_w = original_size
    new_h, new_w = get_preprocess_shape(old_h, old_w, target_length)
    coords = jnp.asarray(coords, jnp.float32)
    return coords * jnp.array([new_w / old_w, new_h / old_h], jnp.float32)


def apply_boxes(boxes: jnp.ndarray, original_size: Tuple[int, int],
                target_length: int) -> jnp.ndarray:
    """Scale (..., 4) xyxy boxes (reference transforms.py:47-53)."""
    flat = apply_coords(boxes.reshape(-1, 2, 2), original_size, target_length)
    return flat.reshape(boxes.shape)


def scale_coords(coords: jnp.ndarray, original_size, target_size) -> jnp.ndarray:
    """Scale (N, 2) xy coords between two (H, W) frames
    (reference segment_anything/utils/prompt_utils.py:146-166)."""
    original_size = jnp.asarray(original_size, jnp.float32)
    target_size = jnp.asarray(target_size, jnp.float32)
    factor = (target_size / original_size)[::-1]  # (H,W) ratio -> (x,y) order
    return jnp.asarray(coords, jnp.float32) * factor


def scale_box(box: jnp.ndarray, original_size, target_size) -> jnp.ndarray:
    """Scale (N, 4) xyxy boxes between two (H, W) frames
    (reference prompt_utils.py:169-184)."""
    coords = scale_coords(jnp.asarray(box, jnp.float32).reshape(-1, 2), original_size, target_size)
    return coords.reshape(-1, 4)


def pad_bottom_right(image: jnp.ndarray, out_hw: Tuple[int, int],
                     value: float = 0.0) -> jnp.ndarray:
    """Zero-pad the last two axes at the bottom/right to ``out_hw``
    (reference sam.py:164-174 preprocessing)."""
    pad_h = out_hw[0] - image.shape[-2]
    pad_w = out_hw[1] - image.shape[-1]
    cfg = [(0, 0)] * (image.ndim - 2) + [(0, pad_h), (0, pad_w)]
    return jnp.pad(image, cfg, constant_values=value)


def resize_longest_side_np(image: np.ndarray, target_length: int) -> np.ndarray:
    """Host-side uint8 HWC image resize to longest-side ``target_length``.

    The reference resizes via PIL's antialiased bilinear (torchvision
    ``resize(to_pil_image(image), target_size)``, transforms.py:26-31); for
    uint8 inputs this calls PIL directly — BIT-EXACT reference parity and
    ~20x faster on host than dispatching the triangle filter through jax
    (which, under a TPU-default backend, would also ship every image through
    the device tunnel and recompile per unique source shape).  Non-uint8 /
    non-PIL-representable inputs fall back to the jax.image triangle filter,
    which matches PIL within 1 uint8 LSB (tests/test_resize.py).
    """
    newh, neww = get_preprocess_shape(image.shape[0], image.shape[1], target_length)
    if image.dtype == np.uint8 and (image.ndim == 2 or
                                    (image.ndim == 3 and image.shape[2] in (1, 3))):
        from PIL import Image

        squeezed = image[..., 0] if (image.ndim == 3 and image.shape[2] == 1) else image
        out = np.asarray(Image.fromarray(squeezed).resize((neww, newh),
                                                          Image.BILINEAR))
        return out[..., None] if (image.ndim == 3 and image.shape[2] == 1) else out
    arr = jnp.asarray(image, jnp.float32)
    if arr.ndim == 3:  # HWC: resize leading two axes
        arr = jnp.moveaxis(arr, -1, 0)
        out = resize_bilinear(arr, (newh, neww), antialias=True)
        out = jnp.moveaxis(out, 0, -1)
    else:
        out = resize_bilinear(arr, (newh, neww), antialias=True)
    return np.asarray(jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8))
