"""Decoder-only SAM over precomputed image embeddings
(reference segment_anything/sam_mask_decoder_head.py).

The reference builds the full SAM, deletes the ViT encoder, and drives the
prompt-encoder + mask-decoder from an HDF5 of offline embeddings, one Python
call per (image, class, round).  Here the same artifact feeds:

* :meth:`SamMaskDecoderHead.predict_mask` — reference API, one prompt at a
  time, masks returned at original resolution;
* :meth:`SamMaskDecoderHead.decode_batched` — the TPU hot path: one jitted
  call decodes *all classes of an image at once* from a static-shape unified
  prompt tensor, and the composed postprocess lands directly on the target
  grid (see engine/postprocess.py), so the whole per-image refinement is two
  device dispatches regardless of class count.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from samcarriestheburden_tpu.config import SamConfig
from samcarriestheburden_tpu.data.h5io import EmbeddingReader
from samcarriestheburden_tpu.engine.postprocess import postprocess_to_grid
from samcarriestheburden_tpu.engine.prompts import Prompt
from samcarriestheburden_tpu.models import convert, mask_decoder, prompt_encoder
from samcarriestheburden_tpu.ops.resize import scale_box, scale_coords

KNOWN_PROMPTS = ("pos_points", "neg_points", "box")


class SamMaskDecoderHead:
    def __init__(self, sam_checkpoint, model_type: str,
                 img_embedding_h5, device=None, *, params=None, cfg=None,
                 compute_dtype=None):
        """sam_checkpoint: full SAM weights (.pth or .npz); the image encoder
        weights are dropped after conversion (reference :31-35).  ``device``
        is accepted for signature parity and ignored (JAX manages placement).
        ``compute_dtype``: decoder matmul/elementwise precision — defaults to
        float32 (the torch-parity contract the rest of the API advertises).
        Pass ``jnp.bfloat16`` as the serving opt-in on TPU: it halves the
        ~1 GB of fp32 upscaling intermediates per batched dispatch (the
        sweep CLI exposes it as ``--decoder_dtype bfloat16``).
        """
        from samcarriestheburden_tpu.config import (
            sam_vit_b_config, sam_vit_h_config, sam_vit_l_config,
            sam_vit_t_config)

        cfg_map = {"vit_h": sam_vit_h_config, "vit_l": sam_vit_l_config,
                   "vit_b": sam_vit_b_config, "vit_t": sam_vit_t_config}
        self.cfg: SamConfig = cfg if cfg is not None else cfg_map[model_type]()

        self.reader = EmbeddingReader(img_embedding_h5)
        self.img_enc_img_size = self.reader.img_encoder_img_size
        if sam_checkpoint is not None:
            name = Path(sam_checkpoint).name
            assert self.reader.checkpoint == name, "SAM checkpoint mismatch"

        if params is None:
            if Path(sam_checkpoint).suffix == ".npz":  # native checkpoint
                from samcarriestheburden_tpu.models import modelio

                params = modelio.load_params(sam_checkpoint)
            else:  # published torch weights
                sd = convert.load_torch_state_dict(sam_checkpoint)
                params = {
                    "prompt_encoder": convert.prompt_encoder_params_from_torch(sd),
                    "mask_decoder": convert.mask_decoder_params_from_torch(
                        sd, self.cfg.mask_decoder),
                }
        self.params = jax.tree.map(jnp.asarray, {
            "prompt_encoder": params["prompt_encoder"],
            "mask_decoder": params["mask_decoder"],
        })
        self.mask_threshold = self.cfg.mask_threshold
        self.compute_dtype = (jnp.float32 if compute_dtype is None
                              else compute_dtype)
        self._decode = jax.jit(self._decode_impl,
                               static_argnames=("image_shared",))
        self._features_cache: Tuple[Optional[str], Optional[jnp.ndarray]] = (None, None)

    # ------------------------------------------------------------------
    # jitted core
    # ------------------------------------------------------------------

    def _decode_impl(self, features, coords, labels, mask_input, use_mask,
                     image_shared=False):
        """features (1, 256, G, G); coords (B, N, 2) input-frame xy; labels
        (B, N) in {-1,0,1,2,3}; mask_input (B, 1, 4G, 4G); use_mask (B,) bool.
        Returns (low_res (B, 1, 4G, 4G), iou (B, 1)).

        ``image_shared`` (static): caller promises no batch item uses a mask
        input (``use_mask`` all-False — the refinement round-1 case), so the
        dense embedding is the shared no-mask default and the decoder runs
        its shared-image fast path (mask_decoder.predict_masks)."""
        pe_p = self.params["prompt_encoder"]
        pe_c = self.cfg.prompt_encoder
        sparse = prompt_encoder.embed_unified_points(pe_p, pe_c, coords, labels)
        if image_shared:
            dense = prompt_encoder.no_mask_dense(pe_p, pe_c, 1)
        else:
            dense = prompt_encoder.embed_masks_or_default(pe_p, pe_c,
                                                          mask_input, use_mask)
        image_pe = prompt_encoder.get_dense_pe(pe_p, pe_c)
        return mask_decoder.apply(self.params["mask_decoder"], self.cfg.mask_decoder,
                                  features, image_pe, sparse, dense,
                                  multimask_output=False,
                                  dtype=self.compute_dtype,
                                  image_shared=image_shared)

    def decode_batched(self, features, coords, labels, mask_input=None,
                       use_mask=None):
        """Batched decode with static shapes (the refinement hot path)."""
        b = coords.shape[0]
        g4 = self.cfg.prompt_encoder.image_embedding_size[0] * 4
        if mask_input is None:
            mask_input = jnp.zeros((b, 1, g4, g4), jnp.float32)
            use_mask = jnp.zeros((b,), bool)
        if use_mask is None:
            use_mask = jnp.ones((b,), bool)
        return self._decode(jnp.asarray(features), jnp.asarray(coords),
                            jnp.asarray(labels), jnp.asarray(mask_input),
                            jnp.asarray(use_mask))

    # ------------------------------------------------------------------
    # artifact access
    # ------------------------------------------------------------------

    def features(self, img_name: str) -> jnp.ndarray:
        cached_name, cached = self._features_cache
        if cached_name != img_name:
            cached = jnp.asarray(self.reader.features(img_name))
            self._features_cache = (img_name, cached)
        return cached

    def sizes(self, img_name: str):
        return self.reader.sizes(img_name)

    # ------------------------------------------------------------------
    # reference API (sam_mask_decoder_head.py:37-104)
    # ------------------------------------------------------------------

    def predict_mask(self, img_name: str, given_prompt: Prompt,
                     prompt2use: Union[str, List[str]],
                     mask_prev_iter=None):
        if isinstance(prompt2use, str):
            prompt2use = [prompt2use]
        assert all(p in KNOWN_PROMPTS for p in prompt2use), \
            f"Prompt must be one of {list(KNOWN_PROMPTS)}"
        original_size, input_size = self.sizes(img_name)

        coords_parts, labels_parts = [], []
        if "pos_points" in prompt2use:
            assert given_prompt.pos_seeds is not None, "pos_seeds are not available"
            pts = np.asarray(scale_coords(given_prompt.pos_seeds,
                                          given_prompt.img_size, input_size))
            coords_parts.append(pts)
            labels_parts.append(np.ones(len(pts), np.int32))
        if "neg_points" in prompt2use:
            assert given_prompt.neg_seeds is not None, "neg_seeds are not available"
            pts = np.asarray(scale_coords(given_prompt.neg_seeds,
                                          given_prompt.img_size, input_size))
            coords_parts.append(pts)
            labels_parts.append(np.zeros(len(pts), np.int32))
        has_points = len(coords_parts) > 0
        if "box" in prompt2use:
            assert given_prompt.box is not None, "box is not available"
            box = np.asarray(scale_box(given_prompt.box[None],
                                       given_prompt.img_size, input_size))[0]
            coords_parts.append(box.reshape(2, 2))
            labels_parts.append(np.asarray([2, 3], np.int32))
        elif has_points:  # reference pads points when no box (prompt_encoder.py:81-85)
            coords_parts.append(np.zeros((1, 2), np.float32))
            labels_parts.append(np.asarray([-1], np.int32))

        coords = np.concatenate(coords_parts).astype(np.float32)[None]
        labels = np.concatenate(labels_parts)[None]

        if mask_prev_iter is not None:
            mask_input = jnp.asarray(mask_prev_iter, jnp.float32)
            use_mask = jnp.ones((1,), bool)
        else:
            mask_input, use_mask = None, None

        low_res, iou = self.decode_batched(self.features(img_name), coords, labels,
                                           mask_input, use_mask)
        masks = self._postprocess_original(low_res, tuple(int(v) for v in input_size),
                                           tuple(int(v) for v in original_size))
        return masks > self.mask_threshold, iou, low_res

    def _postprocess_original(self, low_res, input_size, original_size):
        """Literal reference postprocess (sam_mask_decoder_head.py:106-135) —
        recompiles per unique image size; use :func:`postprocess_to_grid` for
        the batched pipeline."""
        size = self.img_enc_img_size
        from samcarriestheburden_tpu.ops.resize import resize_bilinear

        masks = resize_bilinear(low_res, (size, size))
        masks = masks[..., : input_size[0], : input_size[1]]
        return resize_bilinear(masks, tuple(original_size))

    def postprocess_to_grid(self, low_res, input_size, original_size, out_hw):
        return postprocess_to_grid(low_res, jnp.asarray(input_size),
                                   jnp.asarray(original_size), tuple(out_hw),
                                   img_enc_size=self.img_enc_img_size,
                                   mask_threshold=self.mask_threshold)
