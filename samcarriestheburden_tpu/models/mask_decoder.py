"""SAM mask decoder, functional (reference segment_anything/modeling/mask_decoder.py).

Differences from the reference that are TPU-motivated, not semantic:

* the four hypernetwork MLPs are *stacked* into one parameter pytree and
  evaluated with ``vmap`` instead of a Python loop (mask_decoder.py:139-142);
* ``multimask_output`` slicing is a static argument so both variants compile
  to fixed shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.config import MaskDecoderConfig
from samcarriestheburden_tpu.models import transformer
from samcarriestheburden_tpu.models.common import (
    conv2d_transpose, conv_transpose_init, fast_gelu, gelu, layer_norm_2d,
    layer_norm_init,
    mlp, mlp_init)


def init(key, cfg: MaskDecoderConfig) -> dict:
    ks = jax.random.split(key, 7)
    td = cfg.transformer_dim
    nt = cfg.num_mask_tokens
    hyper_keys = jax.random.split(ks[4], nt)
    # stacked hypernetwork MLPs: vmap over the leading token axis
    hyper = jax.vmap(lambda k: mlp_init(k, td, td, td // 8, 3))(hyper_keys)
    return {
        "transformer": transformer.init(ks[0], cfg),
        "iou_token": jax.random.normal(ks[1], (1, td)),
        "mask_tokens": jax.random.normal(ks[2], (nt, td)),
        "output_upscaling": {
            "up1": conv_transpose_init(ks[3], td, td // 4, (2, 2)),
            "ln": layer_norm_init(td // 4),
            "up2": conv_transpose_init(ks[5], td // 4, td // 8, (2, 2)),
        },
        "output_hypernetworks_mlps": hyper,
        "iou_prediction_head": mlp_init(ks[6], td, cfg.iou_head_hidden_dim,
                                        nt, cfg.iou_head_depth),
    }


def _upscale_hyper_preshuffle(up: dict, src_out: jnp.ndarray,
                              hyper_in: jnp.ndarray, b: int, h: int, w: int,
                              c: int, nt: int) -> jnp.ndarray:
    """``masks = hyper · gelu(convT2(gelu(LN(convT1(src)))))`` with both 2x2
    stride-2 ConvTranspose2d ops evaluated as matmuls in PRE-SHUFFLE lane
    layout; the pixel shuffles happen once, at the end, on the small masks
    tensor.  Lane orders: after step 1, (g1=(dy1,dx1), c4) groups of C//4;
    after step 2, (g1, g2=(dy2,dx2), c8) groups of C//8.  Output pixel
    (4h+2·dy1+dy2, 4w+2·dx1+dx2) — reference upscaling semantics exactly
    (mask_decoder.py:53-59,137-148)."""
    dt = src_out.dtype
    c4, c8 = c // 4, c // 8
    rows = b * h * w
    x2 = src_out.reshape(rows, c)

    # Stored ConvTranspose kernels are SPATIALLY FLIPPED for the
    # lax.conv_transpose convention (models/convert._conv_t w[::-1, ::-1],
    # and conv_transpose_init matches it); direct pixel-shuffle placement
    # needs the torch orientation out[2h+dy, 2w+dx] += x[h, w] · W[dy, dx],
    # so un-flip here.  (Caught by the reference-torch protocol parity test:
    # without this both shuffles mirror, i.e. every 4x4 output block was
    # spatially reversed — tests/test_reference_parity.py.)
    # convT1 -> (rows, 4·c4): W1r[ci, g1·c4 + o] = W1[dy1, dx1, ci, o]
    w1 = up["up1"]["w"][::-1, ::-1].astype(dt)           # (2, 2, C, C//4)
    w1r = jnp.transpose(w1, (2, 0, 1, 3)).reshape(c, 4 * c4)
    y = x2 @ w1r
    if "b" in up["up1"]:
        y = y + jnp.tile(up["up1"]["b"].astype(dt), 4)

    # LayerNorm2d + GELU per g1 group (each group IS one output pixel)
    y4 = y.reshape(rows, 4, c4).astype(jnp.float32)
    mean = jnp.mean(y4, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y4 - mean), axis=-1, keepdims=True)
    yn = (y4 - mean) * jax.lax.rsqrt(var + 1e-6)
    yn = yn * up["ln"]["scale"].astype(jnp.float32) \
        + up["ln"]["bias"].astype(jnp.float32)
    y = gelu(yn).reshape(rows, 4 * c4).astype(dt)

    # convT2 as ONE block-diagonal matmul: (rows, 4·c4) @ (4·c4, 16·c8)
    w2 = up["up2"]["w"][::-1, ::-1].astype(dt)           # (2, 2, C//4, C//8)
    w2r = jnp.transpose(w2, (2, 0, 1, 3)).reshape(c4, 4 * c8)
    w2big = jnp.kron(jnp.eye(4, dtype=dt), w2r)          # (4·c4, 16·c8)
    z = y @ w2big
    if "b" in up["up2"]:
        z = z + jnp.tile(up["up2"]["b"].astype(dt), 16)
    z = gelu(z)                                          # (rows, 16·c8)

    # hypernetwork contraction, block-diagonal over the 16 (g1, g2) groups:
    # HypBig[b, g·c8 + o, g·nt + t] = hyper_in[b, t, o]
    hyp = jnp.transpose(hyper_in.astype(dt), (0, 2, 1))  # (B, c8, nt)
    hypbig = jnp.einsum("gh,bot->bgoht", jnp.eye(16, dtype=dt), hyp,
                        preferred_element_type=dt).reshape(b, 16 * c8, 16 * nt)
    masks = jax.lax.dot_general(
        z.reshape(b, h * w, 16 * c8), hypbig,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (B, hw, 16·nt)

    # the deferred double pixel shuffle, one transpose on the masks tensor
    m = masks.reshape(b, h, w, 2, 2, 2, 2, nt)           # (dy1,dx1,dy2,dx2,t)
    m = jnp.transpose(m, (0, 7, 1, 3, 5, 2, 4, 6))       # b,t,h,dy1,dy2,w,dx1,dx2
    return m.reshape(b, nt, 4 * h, 4 * w)


def predict_masks(params: dict, cfg: MaskDecoderConfig,
                  image_embeddings: jnp.ndarray, image_pe: jnp.ndarray,
                  sparse_prompt_embeddings: jnp.ndarray,
                  dense_prompt_embeddings: jnp.ndarray,
                  dtype=jnp.float32,
                  image_shared: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``predict_masks`` (mask_decoder.py:112-149).

    image_embeddings: (1 or B, C, H, W); image_pe: (1, C, H, W);
    sparse: (B, N, C); dense: (B, C, H, W).
    Returns (masks (B, num_mask_tokens, 4H, 4W), iou_pred (B, num_mask_tokens)).

    ``dtype``: compute precision.  fp32 is the torch-parity default;
    bfloat16 halves the HBM traffic of the upscaling/hypernetwork leg (its
    fp32 intermediates are ~1 GB per batched-refinement dispatch) and is the
    TPU serving setting — outputs return in fp32 either way.

    ``image_shared``: static promise that every batch item decodes the SAME
    image rows — ``image_embeddings`` has batch 1 and the dense embedding is
    identical across the batch (round-1 refinement / AMG point grids, where
    dense is the broadcast no-mask embedding).  The transformer then computes
    its layer-0 image-side projections once instead of B times (numerically
    identical; see transformer.block_apply_image_shared).
    """
    if dtype != jnp.float32:
        cast = lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a
        params = jax.tree.map(cast, params)
        image_embeddings = cast(image_embeddings)
        image_pe = cast(image_pe)
        sparse_prompt_embeddings = cast(sparse_prompt_embeddings)
        dense_prompt_embeddings = cast(dense_prompt_embeddings)
    b = sparse_prompt_embeddings.shape[0]
    nt = cfg.num_mask_tokens

    output_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (b, 1 + nt, cfg.transformer_dim))
    tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

    if image_shared:
        assert image_embeddings.shape[0] == 1, \
            "image_shared requires batch-1 image embeddings"
        src = image_embeddings + dense_prompt_embeddings[:1]
    else:
        src = jnp.broadcast_to(image_embeddings, (b,) + image_embeddings.shape[1:])
        src = src + dense_prompt_embeddings
    _, c, h, w = src.shape

    hs, src_out = transformer.apply(params["transformer"], cfg, src, image_pe,
                                    tokens, image_shared=image_shared)
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1:1 + nt, :]

    # hypernetworks: vmap over the stacked token axis (reference loop :139-142)
    hyper_in = jax.vmap(lambda p, t: mlp(p, t), in_axes=(0, 1), out_axes=1)(
        params["output_hypernetworks_mlps"], mask_tokens_out)  # (B, nt, C//8)

    up = params["output_upscaling"]
    if up["up1"]["w"].shape[:2] == (2, 2) and up["up2"]["w"].shape[:2] == (2, 2):
        # PRE-SHUFFLE matmul form of the 4x upscale + hypernetwork tail
        # (kernel == stride, so each ConvTranspose2d is a per-pixel matmul
        # followed by a 2x2 pixel shuffle).  Deferring BOTH shuffles to one
        # final transpose keeps every tensor's minor dims 128-aligned —
        # the shuffled (B, 4H, 4W, 32) form is 4x lane-padded in HBM — and
        # turns the hypernetwork contraction (K=32, M=nt: ~1% MXU
        # utilisation as a plain dot, 2.3 ms/img traced round 3) into a
        # block-diagonal matmul XLA can tile.  Numerically the same graph.
        masks = _upscale_hyper_preshuffle(up, src_out, hyper_in, b, h, w, c,
                                          nt)
    else:
        x = src_out.reshape(b, h, w, c)
        x = conv2d_transpose(up["up1"], x, (2, 2))
        # (fast_gelu's fp32 polynomial was tried here for the bf16 path; its
        # upcast doubles traffic on the ~0.5 GB upscale tensor and measured
        # slower than the erfc lowering — keep plain gelu in both modes)
        x = gelu(layer_norm_2d(up["ln"], x))
        x = gelu(conv2d_transpose(up["up2"], x, (2, 2)))
        upscaled = x  # (B, 4H, 4W, C//8)
        hw4 = upscaled.shape[1] * upscaled.shape[2]
        masks = jax.lax.dot_general(
            hyper_in, upscaled.reshape(b, hw4, upscaled.shape[3]),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (B, nt, 4H*4W)
        masks = masks.reshape(b, nt, upscaled.shape[1], upscaled.shape[2])
    iou_pred = mlp(params["iou_prediction_head"], iou_token_out)
    return masks.astype(jnp.float32), iou_pred.astype(jnp.float32)


def apply(params: dict, cfg: MaskDecoderConfig,
          image_embeddings: jnp.ndarray, image_pe: jnp.ndarray,
          sparse_prompt_embeddings: jnp.ndarray,
          dense_prompt_embeddings: jnp.ndarray,
          multimask_output: bool, dtype=jnp.float32,
          image_shared: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``MaskDecoder.forward`` (mask_decoder.py:71-110)."""
    masks, iou_pred = predict_masks(params, cfg, image_embeddings, image_pe,
                                    sparse_prompt_embeddings,
                                    dense_prompt_embeddings, dtype,
                                    image_shared=image_shared)
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, sl], iou_pred[:, sl]
