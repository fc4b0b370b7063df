"""SamPredictor: set-image-once / predict-many API
(reference segment_anything/predictor.py).

The encoder input is zero-padded to the static (img_size, img_size) square on
the host and normalised under a validity mask on device (sam.py:164-174
semantics), so ONE encoder trace serves every image and AMG-crop size — the
reference re-traces nothing because torch is eager, and a naive jit would
recompile the ViT per distinct short side.  Accepts numpy arrays everywhere
the reference accepts torch tensors (``predict_torch`` is kept as an alias of
:meth:`predict_batched` for drop-in compatibility)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samcarriestheburden_tpu.models.sam import SamModel
from samcarriestheburden_tpu.ops.resize import (
    apply_boxes, apply_coords, get_preprocess_shape, resize_longest_side_np)


class SamPredictor:
    def __init__(self, sam_model: SamModel, *, dtype=jnp.float32,
                 attention_impl=None):
        """``dtype``: encoder compute precision (bfloat16 for TPU serving)."""
        from samcarriestheburden_tpu.engine.embeddings import make_encode_batch

        self.model = sam_model
        self.dtype = dtype
        self._encode = make_encode_batch(sam_model, dtype=dtype,
                                         attention_impl=attention_impl)
        self.reset_image()

    # ------------------------------------------------------------------

    def set_image(self, image: np.ndarray, image_format: str = "RGB") -> None:
        """image: HWC uint8 (reference predictor.py:34-60)."""
        assert image_format in ("RGB", "BGR"), \
            f"image_format must be in ['RGB', 'BGR'], is {image_format}."
        if image_format != self.model.image_format:
            image = image[..., ::-1]
        input_image = resize_longest_side_np(image, self.model.img_size)
        input_chw = np.ascontiguousarray(input_image.transpose(2, 0, 1))
        self.set_input_image(input_chw, image.shape[:2])

    def set_input_image(self, transformed_image: np.ndarray,
                        original_image_size: Tuple[int, int]) -> None:
        """transformed_image: (3, H, W) already resized-longest-side
        (reference ``set_torch_image``, predictor.py:62-90)."""
        assert (transformed_image.ndim == 3 and transformed_image.shape[0] == 3
                and max(transformed_image.shape[1:]) == self.model.img_size), \
            f"input must be CHW with long side {self.model.img_size}."
        self.reset_image()
        self.original_size = tuple(int(v) for v in original_image_size)
        self.input_size = tuple(int(v) for v in transformed_image.shape[-2:])
        size = self.model.img_size
        padded = np.zeros((1, 3, size, size), np.float32)
        padded[0, :, : self.input_size[0], : self.input_size[1]] = transformed_image
        self.features = self._encode(
            self.model.params, jnp.asarray(padded),
            jnp.asarray([self.input_size], jnp.int32))
        self.is_image_set = True

    set_torch_image = set_input_image  # reference spelling

    # ------------------------------------------------------------------

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Original-frame numpy prompts (reference predictor.py:92-166)."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) before mask prediction.")

        coords = labels = boxes = mask_arr = None
        if point_coords is not None:
            assert point_labels is not None, \
                "point_labels must be supplied if point_coords is supplied."
            coords = np.asarray(apply_coords(point_coords, self.original_size,
                                             self.model.img_size))[None]
            labels = np.asarray(point_labels, np.int32)[None]
        if box is not None:
            boxes = np.asarray(apply_boxes(np.asarray(box, np.float32),
                                           self.original_size,
                                           self.model.img_size)).reshape(1, 4)
        if mask_input is not None:
            mask_arr = np.asarray(mask_input, np.float32)[None]

        masks, iou, low_res = self.predict_batched(coords, labels, boxes, mask_arr,
                                                   multimask_output, return_logits)
        return np.asarray(masks[0]), np.asarray(iou[0]), np.asarray(low_res[0])

    def predict_batched(self, point_coords=None, point_labels=None, boxes=None,
                        mask_input=None, multimask_output: bool = True,
                        return_logits: bool = False):
        """Input-frame batched prompts (reference ``predict_torch``,
        predictor.py:168-243)."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) before mask prediction.")

        points = (jnp.asarray(point_coords), jnp.asarray(point_labels)) \
            if point_coords is not None else None
        sparse, dense = self.model.encode_prompts(
            points=points,
            boxes=jnp.asarray(boxes) if boxes is not None else None,
            masks=jnp.asarray(mask_input) if mask_input is not None else None)

        low_res, iou = self.model.decode_masks(
            self.features, self.model.get_dense_pe(), sparse, dense,
            multimask_output,
            # one image, no per-prompt mask input -> shared image side
            image_shared=(mask_input is None and self.features.shape[0] == 1))
        masks = self.model.postprocess_masks(low_res, self.input_size,
                                             self.original_size)
        if not return_logits:
            masks = masks > self.model.mask_threshold
        return masks, iou, low_res

    predict_torch = predict_batched  # reference spelling

    # ------------------------------------------------------------------

    def get_image_embedding(self):
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) to generate an embedding.")
        assert self.features is not None, "Features must exist if an image has been set."
        return self.features

    @property
    def device(self):
        return jax.devices()[0]

    @property
    def transform(self):
        """Reference exposes a ResizeLongestSide here; provide the shape math."""
        return _TransformShim(self.model.img_size)

    def reset_image(self) -> None:
        self.is_image_set = False
        self.features = None
        self.original_size = None
        self.input_size = None


class _TransformShim:
    """Minimal ResizeLongestSide-compatible helper (reference utils/transforms.py)."""

    def __init__(self, target_length: int):
        self.target_length = target_length

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        return resize_longest_side_np(image, self.target_length)

    def apply_coords(self, coords, original_size):
        return np.asarray(apply_coords(coords, tuple(original_size), self.target_length))

    def apply_boxes(self, boxes, original_size):
        return np.asarray(apply_boxes(np.asarray(boxes, np.float32),
                                      tuple(original_size), self.target_length))

    @staticmethod
    def get_preprocess_shape(oldh, oldw, long_side_length):
        return get_preprocess_shape(oldh, oldw, long_side_length)
