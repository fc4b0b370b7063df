"""SAM prompt encoder, functional (reference segment_anything/modeling/prompt_encoder.py).

Two call styles:

* :func:`apply` — reference-shaped forward ``(points, boxes, masks)`` with
  optional arguments, for API parity (prompt_encoder.py:128-168).
* :func:`embed_unified_points` — everything as one static-shape (B, N, 2)
  coords + (B, N) labels tensor with labels in {-1 pad, 0 neg, 1 pos,
  2 box-TL, 3 box-BR}; the layout SAM's own ONNX export uses
  (utils/onnx.py:51-66) and the one that vmaps over classes on TPU.

Coordinates are expected in the *input-image frame* (after resize-longest-
side), exactly like the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samcarriestheburden_tpu.config import PromptEncoderConfig
from samcarriestheburden_tpu.models.common import (
    conv2d, conv2d_init, gelu, layer_norm_2d, layer_norm_init)


def init(key, cfg: PromptEncoderConfig) -> dict:
    keys = jax.random.split(key, 8)
    ed = cfg.embed_dim
    mc = cfg.mask_in_chans
    return {
        # PositionEmbeddingRandom gaussian matrix, scale=1 (prompt_encoder.py:176-183)
        "pe_gaussian": jax.random.normal(keys[0], (2, ed // 2)),
        # 4 point-type embeddings: [neg, pos, box-TL, box-BR] (:45-47)
        "point_embeddings": jax.random.normal(keys[1], (4, ed)),
        "not_a_point_embed": jax.random.normal(keys[2], (1, ed)),
        "no_mask_embed": jax.random.normal(keys[3], (1, ed)),
        "mask_downscaling": {
            "conv1": conv2d_init(keys[4], 1, mc // 4, (2, 2)),
            "ln1": layer_norm_init(mc // 4),
            "conv2": conv2d_init(keys[5], mc // 4, mc, (2, 2)),
            "ln2": layer_norm_init(mc),
            "conv3": conv2d_init(keys[6], mc, ed, (1, 1)),
        },
    }


# ---------------------------------------------------------------------------
# Random Fourier positional encoding
# ---------------------------------------------------------------------------


def _pe_encoding(params: dict, coords01: jnp.ndarray) -> jnp.ndarray:
    """Encode coords normalised to [0,1]² -> (..., embed_dim)
    (reference prompt_encoder.py:185-192)."""
    coords = 2 * coords01 - 1
    coords = coords @ params["pe_gaussian"].astype(coords01.dtype)
    coords = 2 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def get_dense_pe(params: dict, cfg: PromptEncoderConfig) -> jnp.ndarray:
    """Grid positional encoding, shape (1, embed_dim, H, W) — NCHW for API
    parity with ``PromptEncoder.get_dense_pe`` (reference :62-71)."""
    h, w = cfg.image_embedding_size
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (H, W, 2) as (x, y)
    pe = _pe_encoding(params, grid)  # (H, W, C)
    return jnp.transpose(pe, (2, 0, 1))[None]


def pe_with_coords(params: dict, coords: jnp.ndarray,
                   image_size: Tuple[int, int]) -> jnp.ndarray:
    """Encode unnormalised (..., 2) xy coords against (H, W) ``image_size``
    (reference :207-214)."""
    norm = coords / jnp.asarray([image_size[1], image_size[0]], coords.dtype)
    return _pe_encoding(params, norm)


# ---------------------------------------------------------------------------
# Unified static-shape path (vmap-friendly)
# ---------------------------------------------------------------------------


def embed_unified_points(params: dict, cfg: PromptEncoderConfig,
                         coords: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sparse embeddings from one (B, N, 2) coords + (B, N) int labels tensor.

    Labels: -1 padding/not-a-point, 0 negative point, 1 positive point,
    2 box top-left corner, 3 box bottom-right corner.  Point entries get the
    +0.5 pixel-centre shift the reference applies (prompt_encoder.py:80,95).
    Returns (B, N, embed_dim).
    """
    coords = coords.astype(jnp.float32) + 0.5
    # Accept float label arrays too: the reference casts with torch.int at the
    # predictor layer (predictor.py:144) but its Sam.forward takes whatever the
    # caller built; indexing requires ints, so normalise here (free under jit).
    labels = labels.astype(jnp.int32)
    pe = pe_with_coords(params, coords, cfg.input_image_size)
    type_emb = params["point_embeddings"][jnp.clip(labels, 0, 3)]
    is_pad = (labels == -1)[..., None]
    return jnp.where(is_pad,
                     params["not_a_point_embed"][0],
                     pe + type_emb)


def no_mask_dense(params: dict, cfg: PromptEncoderConfig, batch: int) -> jnp.ndarray:
    """Dense embedding when no mask prompt is given (reference :164-166).
    Returns NCHW (B, embed_dim, H, W)."""
    h, w = cfg.image_embedding_size
    return jnp.broadcast_to(
        params["no_mask_embed"].reshape(1, -1, 1, 1),
        (batch, cfg.embed_dim, h, w))


def embed_masks(params: dict, cfg: PromptEncoderConfig, masks: jnp.ndarray) -> jnp.ndarray:
    """Downscale (B, 1, 4H, 4W) mask logits to dense embeddings
    (B, embed_dim, H, W) (reference :51-59,102-105)."""
    p = params["mask_downscaling"]
    x = jnp.transpose(masks, (0, 2, 3, 1))  # NHWC
    x = conv2d(p["conv1"], x, stride=(2, 2), padding="VALID")
    x = gelu(layer_norm_2d(p["ln1"], x))
    x = conv2d(p["conv2"], x, stride=(2, 2), padding="VALID")
    x = gelu(layer_norm_2d(p["ln2"], x))
    x = conv2d(p["conv3"], x, padding="VALID")
    return jnp.transpose(x, (0, 3, 1, 2))


def embed_masks_or_default(params: dict, cfg: PromptEncoderConfig,
                           masks: jnp.ndarray, use_mask: jnp.ndarray) -> jnp.ndarray:
    """Static-shape variant of the mask/no-mask branch: always runs the
    downscaler, selects per-batch-element with ``use_mask`` (B,) bool.
    This is what lets the 2-round refinement protocol stay inside one jit."""
    dense = embed_masks(params, cfg, masks)
    default = no_mask_dense(params, cfg, masks.shape[0])
    return jnp.where(use_mask[:, None, None, None], dense, default)


# ---------------------------------------------------------------------------
# Reference-shaped forward
# ---------------------------------------------------------------------------


def apply(params: dict, cfg: PromptEncoderConfig,
          points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
          boxes: Optional[jnp.ndarray] = None,
          masks: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``PromptEncoder.forward`` (prompt_encoder.py:128-168).

    points: ((B, N, 2) coords, (B, N) labels in {-1, 0, 1}) or None
    boxes:  (B, 4) xyxy or None
    masks:  (B, 1, 4H, 4W) or None
    Returns (sparse (B, N', embed_dim), dense (B, embed_dim, H, W)).
    """
    if points is not None:
        bs = points[0].shape[0]
    elif boxes is not None:
        bs = boxes.shape[0]
    elif masks is not None:
        bs = masks.shape[0]
    else:
        bs = 1

    sparse_parts = []
    if points is not None:
        coords, labels = points
        if boxes is None:  # pad with a single not-a-point (reference :81-85)
            coords = jnp.concatenate([coords, jnp.zeros((bs, 1, 2), coords.dtype)], axis=1)
            labels = jnp.concatenate([labels, -jnp.ones((bs, 1), labels.dtype)], axis=1)
        sparse_parts.append(embed_unified_points(params, cfg, coords, labels))
    if boxes is not None:
        corners = boxes.reshape(-1, 2, 2)
        corner_labels = jnp.broadcast_to(jnp.asarray([2, 3]), corners.shape[:2])
        sparse_parts.append(
            embed_unified_points(params, cfg, corners, corner_labels).reshape(bs, -1, cfg.embed_dim))

    if sparse_parts:
        sparse = jnp.concatenate(sparse_parts, axis=1)
    else:
        sparse = jnp.zeros((bs, 0, cfg.embed_dim))

    if masks is not None:
        dense = embed_masks(params, cfg, masks)
    else:
        dense = no_mask_dense(params, cfg, bs)
    return sparse, dense
