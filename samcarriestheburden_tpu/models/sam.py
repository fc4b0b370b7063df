"""Composite SAM model, functional (reference segment_anything/modeling/sam.py).

``SamModel`` is a lightweight immutable holder of (config, params) exposing
the reference's surface — ``preprocess``, ``postprocess_masks``, encoder /
prompt-encoder / decoder application — with jit-compiled internals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.config import SamConfig
from samcarriestheburden_tpu.models import image_encoder, mask_decoder, prompt_encoder
from samcarriestheburden_tpu.ops.resize import pad_bottom_right, resize_bilinear


def init(key, cfg: SamConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": image_encoder.init(k1, cfg.image_encoder),
        "prompt_encoder": prompt_encoder.init(k2, cfg.prompt_encoder),
        "mask_decoder": mask_decoder.init(k3, cfg.mask_decoder),
    }


def preprocess(cfg: SamConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Normalise pixels and bottom/right-pad to the square encoder input
    (reference sam.py:164-174).  x: (..., 3, H, W) with H, W <= img_size."""
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32).reshape(-1, 1, 1)
    std = jnp.asarray(cfg.pixel_std, jnp.float32).reshape(-1, 1, 1)
    x = (x.astype(jnp.float32) - mean) / std
    size = cfg.image_encoder.img_size
    return pad_bottom_right(x, (size, size))


def postprocess_masks(cfg: SamConfig, masks: jnp.ndarray,
                      input_size: Tuple[int, int],
                      original_size: Tuple[int, int]) -> jnp.ndarray:
    """Upscale low-res mask logits to the original image frame
    (reference sam.py:133-162): 256² -> img_size² bilinear, crop the padded
    region, then bilinear to original_size.  Sizes are static ints."""
    size = cfg.image_encoder.img_size
    masks = resize_bilinear(masks, (size, size))
    masks = masks[..., : input_size[0], : input_size[1]]
    return resize_bilinear(masks, tuple(original_size))


@dataclass(frozen=True)
class SamModel:
    """(config, params) bundle with the reference Sam surface."""

    cfg: SamConfig
    params: dict

    @property
    def mask_threshold(self) -> float:
        return self.cfg.mask_threshold

    @property
    def image_format(self) -> str:
        return self.cfg.image_format

    @property
    def img_size(self) -> int:
        return self.cfg.image_encoder.img_size

    # -- stages -----------------------------------------------------------

    def preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        return preprocess(self.cfg, x)

    def encode_image(self, x: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
        """(B, 3, img, img) preprocessed -> (B, 256, grid, grid)."""
        return image_encoder.apply(self.params["image_encoder"],
                                   self.cfg.image_encoder, x, dtype=dtype)

    def encode_prompts(self, points=None, boxes=None, masks=None):
        return prompt_encoder.apply(self.params["prompt_encoder"],
                                    self.cfg.prompt_encoder,
                                    points=points, boxes=boxes, masks=masks)

    def get_dense_pe(self) -> jnp.ndarray:
        return prompt_encoder.get_dense_pe(self.params["prompt_encoder"],
                                           self.cfg.prompt_encoder)

    def decode_masks(self, image_embeddings, image_pe, sparse, dense,
                     multimask_output: bool, image_shared: bool = False):
        """``image_shared``: static promise that all prompt-batch items decode
        the same batch-1 image embedding with the no-mask dense default (no
        per-item mask inputs) — enables the decoder's shared-image layer-0
        path (numerically identical)."""
        return mask_decoder.apply(self.params["mask_decoder"], self.cfg.mask_decoder,
                                  image_embeddings, image_pe, sparse, dense,
                                  multimask_output, image_shared=image_shared)

    def postprocess_masks(self, masks, input_size, original_size):
        return postprocess_masks(self.cfg, masks, input_size, original_size)

    # -- reference batched forward (sam.py:53-131) ------------------------

    def forward(self, batched_input: List[Dict[str, Any]],
                multimask_output: bool) -> List[Dict[str, jnp.ndarray]]:
        """End-to-end prediction over a list of per-image dicts, mirroring
        ``Sam.forward``.  Python-loop driver kept for API parity; the batched
        TPU path is SamPredictor/the embedding pipeline."""
        images = jnp.stack([self.preprocess(rec["image"]) for rec in batched_input])
        embeddings = self.encode_image(images)

        outputs = []
        for rec, emb in zip(batched_input, embeddings):
            points = None
            if "point_coords" in rec:
                points = (rec["point_coords"], rec["point_labels"])
            sparse, dense = self.encode_prompts(
                points=points, boxes=rec.get("boxes"), masks=rec.get("mask_inputs"))
            low_res, iou = self.decode_masks(emb[None], self.get_dense_pe(),
                                             sparse, dense, multimask_output)
            masks = self.postprocess_masks(
                low_res, tuple(rec["image"].shape[-2:]), tuple(rec["original_size"]))
            outputs.append({
                "masks": masks > self.mask_threshold,
                "iou_predictions": iou,
                "low_res_logits": low_res,
            })
        return outputs
