"""Binary morphology on device.

The reference leans on kornia's GPU morphology with skimage structuring
elements (utils/segmentation_preprocessing.py:2-4, seg_refinement.py:43-61).
Everything the pipeline actually morphs is a 0/1 mask, so flat binary
morphology suffices; on TPU it becomes a single cross-correlation against the
structuring element (MXU/VPU-friendly) plus a threshold:

* dilation(x)[p] = 1  iff  Σ_q SE[q] · x[p + q − origin] > 0
* erosion(x)[p]  = 1  iff  Σ_q SE[q] · x[p + q − origin] = ΣSE

with origin = size // 2 and kornia's "geodesic" border semantics (dilation
pads 0, erosion pads 1).

Structuring elements reproduce skimage.morphology.{square,disk,diamond,star}
(the reference imports them at segmentation_preprocessing.py:4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Structuring elements (skimage-compatible)
# ---------------------------------------------------------------------------


def square(width: int, dtype=np.uint8) -> np.ndarray:
    """width × width block of ones (skimage.morphology.square).

    NB: the reference passes its ``radius`` knob directly as the *width*
    (seg_refinement.py:52), so 'square radius 8' means an 8×8 kernel."""
    return np.ones((width, width), dtype=dtype)


def disk(radius: int, dtype=np.uint8) -> np.ndarray:
    """(2r+1)² disk: x² + y² <= r²."""
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (xx ** 2 + yy ** 2 <= radius ** 2).astype(dtype)


def diamond(radius: int, dtype=np.uint8) -> np.ndarray:
    """(2r+1)² diamond: |x| + |y| <= r."""
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (np.abs(xx) + np.abs(yy) <= radius).astype(dtype)


def star(a: int, dtype=np.uint8) -> np.ndarray:
    """skimage's star: union of a centred square of side 2a+1 and the diamond
    that is its 45°-rotated convex hull, in a (2a+1+2·(a//2))² array."""
    if a == 1:
        return np.ones((3, 3), dtype)
    m = 2 * a + 1
    n = a // 2
    size = m + 2 * n
    c = (size - 1) // 2
    yy, xx = np.mgrid[:size, :size]
    in_square = (np.abs(yy - c) <= a) & (np.abs(xx - c) <= a)
    in_diamond = np.abs(yy - c) + np.abs(xx - c) <= c
    return (in_square | in_diamond).astype(dtype)


STRUCT_ELEMENTS = {"square": square, "disk": disk, "diamond": diamond, "star": star}


def get_struct_element(name: str, radius: int) -> np.ndarray:
    """Resolve a structuring element by name, with the reference's
    square-radius-0 == identity special case (seg_refinement.py:49-51)."""
    if name not in STRUCT_ELEMENTS:
        raise NotImplementedError(f"Invalid structuring element: {name}")
    if name == "square" and radius == 0:
        radius = 1
    return STRUCT_ELEMENTS[name](radius)


# ---------------------------------------------------------------------------
# Morphological ops
# ---------------------------------------------------------------------------


def _correlate_counts(mask: jnp.ndarray, kernel: jnp.ndarray,
                      pad_value: float) -> jnp.ndarray:
    """Cross-correlate (..., H, W) 0/1 mask with the SE, origin at size//2."""
    kh, kw = kernel.shape
    oh, ow = kh // 2, kw // 2
    lead = mask.shape[:-2]
    x = mask.reshape((-1, 1) + mask.shape[-2:]).astype(jnp.float32)
    x = jnp.pad(x, [(0, 0), (0, 0), (oh, kh - 1 - oh), (ow, kw - 1 - ow)],
                constant_values=pad_value)
    k = jnp.asarray(kernel, jnp.float32)[None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(lead + mask.shape[-2:])


@jax.jit
def dilation(mask: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Binary dilation of (..., H, W) masks; returns float 0/1."""
    counts = _correlate_counts(mask, kernel, pad_value=0.0)
    return (counts > 0.5).astype(mask.dtype)


@jax.jit
def erosion(mask: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Binary erosion of (..., H, W) masks; returns float 0/1.
    Border pixels see ones outside the image (kornia geodesic semantics)."""
    counts = _correlate_counts(mask, kernel, pad_value=1.0)
    total = jnp.sum(kernel.astype(jnp.float32))
    return (counts > total - 0.5).astype(mask.dtype)


def erode_mask_with_disc_struct(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Disk-SE erosion of a (C, H, W) boolean mask -> bool
    (reference utils/segmentation_preprocessing.py:55-71)."""
    assert mask.ndim == 3, "mask should be 3D tensor of shape (C, H, W)"
    assert radius > 0, "radius should be greater than 0"
    return erosion(mask.astype(jnp.float32), jnp.asarray(disk(radius))).astype(bool)
