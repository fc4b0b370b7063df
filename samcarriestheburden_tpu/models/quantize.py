"""One-time int8 prequantization of the SAM image-encoder weights.

Round-2 lesson (VERDICT.md): quantizing weights *inside* the jitted encoder
re-scans ViT-H's 0.6B params every forward — an HBM pass that eats the int8
MXU gain.  Here the transformer weights are quantized ONCE on device into an
int8 params pytree (symmetric per-output-channel absmax, the scheme of
kernels/quant.py) and the encoder consumes it directly; the quantized pytree
also halves the per-block weight HBM traffic that the scanned block loop
streams.

The quantized pytree is only valid for the fused TPU path
(``image_encoder.apply(..., fused_mlp=True, fused_qkv=True,
quantize="int8")``): the raw ``attn.qkv`` / ``mlp.lin*.w`` weights are
*replaced* by their packed int8 forms, so the XLA fall paths cannot consume
it (``apply`` asserts).  This mirrors the reference's own deployment
practice of shipping a quantized artifact distinct from the fp checkpoint
(reference scripts/export_onnx_model.py:187-201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.config import ImageEncoderConfig, SamConfig
from samcarriestheburden_tpu.kernels.quant import quantize_weight


def is_prequantized(block_params: dict) -> bool:
    return "wq" in block_params.get("mlp", {}).get("lin1", {})


def _quantize_linear(p_lin: dict) -> dict:
    wq, s = quantize_weight(p_lin["w"])
    b = p_lin.get("b")
    if b is None:
        b = jnp.zeros((p_lin["w"].shape[1],), jnp.float32)
    return {"wq": wq, "s": s, "b": b}


def _quantize_block(p: dict, num_heads: int) -> dict:
    from samcarriestheburden_tpu.kernels.attention import prepare_qkv_headmajor

    w_hm, b_hm = prepare_qkv_headmajor(p["attn"], num_heads, jnp.float32)
    wq, s = quantize_weight(w_hm)
    attn = {
        "qkv_hm": {"wq": wq, "s": s, "b": b_hm},
        "proj": p["attn"]["proj"],
    }
    for k in ("rel_pos_h", "rel_pos_w"):
        if k in p["attn"]:
            attn[k] = p["attn"][k]
    return {
        "norm1": p["norm1"],
        "norm2": p["norm2"],
        "attn": attn,
        "mlp": {"lin1": _quantize_linear(p["mlp"]["lin1"]),
                "lin2": _quantize_linear(p["mlp"]["lin2"])},
    }


def prequantize_image_encoder(params: dict, cfg: ImageEncoderConfig) -> dict:
    """Image-encoder params -> int8-prequantized params (new pytree; the
    patch embed, pos embed and neck stay fp — they are bandwidth-trivial and
    accuracy-critical).  Runs under jit once; call outside the serving loop."""
    out = {k: v for k, v in params.items() if k != "blocks"}
    quant = jax.jit(lambda p: _quantize_block(p, cfg.num_heads))
    out["blocks"] = [quant(b) for b in params["blocks"]]
    return out


def prequantize_sam(params: dict, cfg: SamConfig) -> dict:
    """Full SAM params with the image encoder int8-prequantized (prompt
    encoder + mask decoder untouched — they are <1% of inference FLOPs)."""
    out = dict(params)
    out["image_encoder"] = prequantize_image_encoder(
        params["image_encoder"], cfg.image_encoder)
    return out
