"""Exportable decoder-side SAM program
(reference segment_anything/utils/onnx.py + scripts/export_onnx_model.py).

The reference traces prompt-encoder + decoder + postprocess to ONNX with
dynamic point counts.  The TPU-native equivalent serialises the same program
as **StableHLO** via ``jax.export`` — runnable from any PJRT runtime —
with shape polymorphism over the batch/point axes.

Semantics mirrored from SamOnnxModel:
* branch-free point/mask embedding (labels −1..3, ``has_mask_input`` gate);
* best-mask selection via the (num_points − 2.5) score-reweighting trick;
* optional stability-score replacement of the IoU scores.

One deliberate difference: XLA programs have static output shapes, so the
exported program returns masks in the fixed img_size² frame together with the
pre-padding size (the reference's ``resize_longest_image_size``); the final
crop + resize to the original frame is one host resize for the consumer —
or use ``postprocess_to_grid`` for a fixed target grid.

ONNX interchange: the same decoder program is also emitted as a real
``.onnx`` artifact by :mod:`export.onnx_graph` (``cli/export_decoder
--format onnx``) — built node-by-node on the dependency-free wire codec in
:mod:`export.onnx_proto`, since this environment has neither the ``onnx``
package nor onnxruntime.  This module stays the PJRT-native path
(TPU/GPU/CPU consume StableHLO directly); both exports share
:func:`make_decoder_fn`, whose program is deliberately kept to
converter-friendly ops (matmul/LN/softmax/resize — no Pallas custom calls
on the decoder path).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.models import mask_decoder, prompt_encoder
from samcarriestheburden_tpu.models.sam import SamModel
from samcarriestheburden_tpu.ops.mask_ops import calculate_stability_score
from samcarriestheburden_tpu.ops.resize import resize_bilinear


def resize_longest_image_size(input_image_size: jnp.ndarray,
                              longest_side: int) -> jnp.ndarray:
    """(2,) original size -> (2,) size after resize-longest-side
    (reference onnx.py:41-49)."""
    size = input_image_size.astype(jnp.float32)
    scale = longest_side / jnp.max(size)
    return jnp.floor(scale * size + 0.5).astype(jnp.int32)


def make_decoder_fn(model: SamModel, return_single_mask: bool,
                    use_stability_score: bool = False,
                    return_extra_metrics: bool = False,
                    stability_score_offset: float = 1.0):
    """Pure fn(params, image_embeddings, point_coords, point_labels,
    mask_input, has_mask_input, orig_im_size) mirroring SamOnnxModel.forward."""
    cfg = model.cfg
    img_size = model.img_size

    def fn(params, image_embeddings, point_coords, point_labels, mask_input,
           has_mask_input, orig_im_size):
        pe_p = params["prompt_encoder"]
        pe_c = cfg.prompt_encoder
        sparse = prompt_encoder.embed_unified_points(
            pe_p, pe_c, point_coords, point_labels)
        dense = prompt_encoder.embed_masks_or_default(
            pe_p, pe_c, mask_input, has_mask_input.reshape(-1).astype(bool))
        image_pe = prompt_encoder.get_dense_pe(pe_p, pe_c)
        masks, scores = mask_decoder.predict_masks(
            params["mask_decoder"], cfg.mask_decoder, image_embeddings,
            image_pe, sparse, dense)

        if use_stability_score:
            scores = calculate_stability_score(
                masks, cfg.mask_threshold, stability_score_offset).astype(scores.dtype)

        if return_single_mask:
            num_points = point_coords.shape[1]
            reweight = jnp.asarray(
                [[1000.0] + [0.0] * (cfg.mask_decoder.num_mask_tokens - 1)])
            score = scores + (num_points - 2.5) * reweight
            best = jnp.argmax(score, axis=1)
            rows = jnp.arange(masks.shape[0])
            masks = masks[rows, best][:, None]
            scores = scores[rows, best][:, None]

        upscaled = resize_bilinear(masks, (img_size, img_size))
        prepadded = resize_longest_image_size(orig_im_size, img_size)

        if return_extra_metrics:
            stability = calculate_stability_score(
                upscaled, cfg.mask_threshold, stability_score_offset)
            areas = jnp.sum(upscaled > cfg.mask_threshold, axis=(-1, -2))
            return upscaled, prepadded, scores, stability, areas, masks
        return upscaled, prepadded, scores, masks

    return fn


def _is_qleaf(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


def quantize_params(params, mode: str):
    """Weight quantization for export (the TPU analogue of the reference's
    dynamic uint8 ONNX quantization, export_onnx_model.py:187-201).

    ``bf16``: every float leaf stored as bfloat16 (native TPU dtype, ~2×
    smaller artifact).  ``int8``: weight-only per-tensor symmetric int8 —
    leaves with ≥2 dims and >1024 elements (the matmul/conv weights, mirroring
    onnxruntime's MatMul-weight quantization) become {q: int8, s: scale};
    activations stay float, dequantization runs in-program.
    """
    if mode == "bf16":
        return jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x), params)
    if mode == "int8":
        def q(x):
            x = jnp.asarray(x)
            if x.dtype != jnp.float32 or x.ndim < 2 or x.size <= 1024:
                return x
            scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
            return {"q": jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8),
                    "s": scale.astype(jnp.float32)}
        return jax.tree.map(q, params)
    raise ValueError(f"unknown quantization mode {mode!r}")


def dequantize_params(params):
    """Inverse of :func:`quantize_params` inside the traced program."""
    return jax.tree.map(
        lambda l: (l["s"] * l["q"].astype(jnp.float32)) if _is_qleaf(l)
        else jnp.asarray(l, jnp.float32) if jnp.asarray(l).dtype == jnp.bfloat16
        else l,
        params, is_leaf=_is_qleaf)


def export_decoder(model: SamModel, out_path, *, return_single_mask: bool,
                   use_stability_score: bool = False,
                   return_extra_metrics: bool = False,
                   batch: Optional[int] = None,
                   num_points: Optional[int] = None,
                   quantize: Optional[str] = None) -> Path:
    """Serialise the decoder program to a .stablehlo file.

    ``batch``/``num_points`` = None exports with symbolic dimensions
    (shape-polymorphic, like the reference's dynamic ONNX axes).
    ``quantize`` = 'bf16' | 'int8' bakes quantized weight constants with
    in-program dequantization (reference's quantize_dynamic analogue).
    """
    from jax import export as jexport

    fn = make_decoder_fn(model, return_single_mask, use_stability_score,
                         return_extra_metrics)
    emb = cfg_embed = model.cfg.prompt_encoder.image_embedding_size
    g4 = emb[0] * 4
    out_chans = model.cfg.mask_decoder.transformer_dim

    if batch is None or num_points is None:
        b, n = jexport.symbolic_shape("b, n")
        if batch is not None:
            b = batch
        if num_points is not None:
            n = num_points
    else:
        b, n = batch, num_points

    args = (
        jax.ShapeDtypeStruct((1, out_chans, *emb), jnp.float32),   # image_embeddings
        jax.ShapeDtypeStruct((b, n, 2), jnp.float32),              # point_coords
        jax.ShapeDtypeStruct((b, n), jnp.int32),                   # point_labels
        jax.ShapeDtypeStruct((b, 1, g4, g4), jnp.float32),         # mask_input
        jax.ShapeDtypeStruct((b,), jnp.float32),                   # has_mask_input
        jax.ShapeDtypeStruct((2,), jnp.int32),                     # orig_im_size
    )
    params = jax.tree.map(jnp.asarray, model.params)
    if quantize is not None:
        qparams = quantize_params(params, quantize)
        run = lambda *a: fn(dequantize_params(qparams), *a)  # noqa: E731
    else:
        run = partial(fn, params)
    exported = jexport.export(jax.jit(run))(*args)
    data = exported.serialize()
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(data)
    return out_path


def load_exported(path):
    """Rehydrate an exported decoder for validation (reference onnxruntime
    round-trip, export_onnx_model.py:161-167)."""
    from jax import export as jexport

    return jexport.deserialize(Path(path).read_bytes())
