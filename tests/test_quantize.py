"""End-to-end accuracy gate for the int8 serving mode (VERDICT r2 #2).

The mode that closes the perf gap must carry an accuracy contract: same
weights, fp32 parity encoder vs the bf16 and int8-prequantized serving
encoders, decoded to thresholded masks through the real prompt-encoder +
mask-decoder stack.  Gates: per-class mask IoU and predicted-quality (SAM
IoU head) drift.  The int8 encoder runs the ``int8_xla`` route — the plain
jnp mirror of the Pallas kernels' exact arithmetic (int32 dots, per-token
round-to-nearest, poly GELU; kernel<->mirror equivalence is covered at the
kernel level in tests/test_kernels.py) — because Mosaic force-interpret at
vit_b scale blows the slow-tier budget.  Measured drift numbers are
recorded in BENCHMARKS.md.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.config import sam_vit_b_config
from samcarriestheburden_tpu.models import (image_encoder, mask_decoder,
                                            prompt_encoder)
from samcarriestheburden_tpu.models import sam as sam_model


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _small_vitb_cfg():
    """Real vit_b geometry (embed 768, depth 12, heads 12, window 14, four
    global layers) at a reduced 448px input — every block type and quant
    shape class of the full model at CPU-viable cost."""
    cfg = sam_vit_b_config()
    enc = dataclasses.replace(cfg.image_encoder, img_size=448)
    pe = dataclasses.replace(cfg.prompt_encoder,
                             image_embedding_size=(28, 28),
                             input_image_size=(448, 448))
    return dataclasses.replace(cfg, image_encoder=enc, prompt_encoder=pe)


@pytest.mark.slow
def test_int8_serving_mask_agreement_vit_b(rng):
    from samcarriestheburden_tpu.models.quantize import prequantize_sam

    cfg = _small_vitb_cfg()
    key = jax.random.PRNGKey(0)
    params = sam_model.init(key, cfg)
    # non-trivial weights; zeros would make quantisation exact
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.03 * jax.random.normal(k, l.shape)
        for l, k in zip(leaves, keys)])

    x = rng.standard_normal((1, 3, 448, 448)).astype(np.float32) * 50 + 120

    def encode(p, dtype, fused, quantize):
        return image_encoder.apply(p["image_encoder"], cfg.image_encoder,
                                   jnp.asarray(x), dtype=dtype,
                                   fused_mlp=fused, fused_qkv=fused,
                                   quantize=quantize)

    feats32 = np.asarray(encode(params, jnp.float32, False, None))
    feats_bf16 = np.asarray(encode(params, jnp.bfloat16, False, None))
    pq = prequantize_sam(params, cfg)
    feats_int8 = np.asarray(encode(pq, jnp.bfloat16, True, "int8_xla"))

    # decode each through the real prompt/mask decoder with box prompts
    n_cls = 6
    boxes = rng.uniform(40, 400, (n_cls, 2, 2)).astype(np.float32)
    coords = jnp.asarray(np.sort(boxes, axis=1))
    labels = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (n_cls, 1))

    @jax.jit
    def decode(features):
        sparse = prompt_encoder.embed_unified_points(
            params["prompt_encoder"], cfg.prompt_encoder, coords, labels)
        dense = prompt_encoder.no_mask_dense(params["prompt_encoder"],
                                             cfg.prompt_encoder, n_cls)
        image_pe = prompt_encoder.get_dense_pe(params["prompt_encoder"],
                                               cfg.prompt_encoder)
        return mask_decoder.apply(params["mask_decoder"], cfg.mask_decoder,
                                  jnp.asarray(features), image_pe, sparse,
                                  dense, False)

    def masks_and_quality(feats):
        low, iou = decode(feats)
        return np.asarray(low)[:, 0] > cfg.mask_threshold, np.asarray(iou)

    m32, q32 = masks_and_quality(feats32)
    mb, qb = masks_and_quality(feats_bf16)
    m8, q8 = masks_and_quality(feats_int8)

    def iou(a, b):
        inter = (a & b).sum(axis=(1, 2))
        union = (a | b).sum(axis=(1, 2))
        return inter / np.maximum(union, 1)

    iou_bf16 = iou(m32, mb)
    iou_int8 = iou(m32, m8)
    drift_bf16 = np.abs(qb - q32).max()
    drift_int8 = np.abs(q8 - q32).max()
    print(f"mask IoU vs fp32: bf16 {iou_bf16.min():.4f}  "
          f"int8 {iou_int8.min():.4f}; "
          f"quality drift: bf16 {drift_bf16:.4f}  int8 {drift_int8:.4f}")

    # the gate: int8 masks agree with fp32 within tight bounds, and the
    # int8-specific degradation over the bf16 serving mode is marginal
    assert iou_int8.min() > 0.97, iou_int8
    assert drift_int8 < 0.02, drift_int8
    assert iou_int8.min() > iou_bf16.min() - 0.02, (iou_int8, iou_bf16)
