"""PyTorch-checkpoint → params-pytree converters.

The published SAM weights (``sam_vit_h_4b8939.pth`` etc., loaded by the
reference at build_sam.py:103-106) and the reference U-Net's LoadableModel
bundles (modelio.py:67-86) are plain torch state dicts.  These functions remap
them into this package's pytrees:

* linear weights (out, in) → (in, out);
* conv weights OIHW → HWIO;
* transposed-conv weights (in, out, kh, kw) → HWIO **with spatial flip**
  (the jax.lax.conv_transpose convention, verified numerically against torch);
* per-index module lists (hypernetwork MLPs) → stacked leading axes.

Tensors arrive as numpy arrays — use :func:`load_torch_state_dict` which reads
a ``.pth`` without needing the torch runtime on the hot path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from samcarriestheburden_tpu.config import SamConfig, UNetConfig


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: np.ndarray} on CPU."""
    import torch

    with open(path, "rb") as f:
        state = torch.load(f, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model_state" in state:  # LoadableModel bundle
        return state
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}


# ---------------------------------------------------------------------------
# leaf converters
# ---------------------------------------------------------------------------


def _lin(sd, prefix, bias=True):
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _conv(sd, prefix, bias=True):
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if bias and prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _conv_t(sd, prefix, bias=True):
    w = sd[prefix + ".weight"].transpose(2, 3, 0, 1)  # (kh, kw, in, out)
    p = {"w": np.ascontiguousarray(w[::-1, ::-1])}
    if bias and prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _attn_downsampled(sd, prefix):
    return {
        "q_proj": _lin(sd, prefix + ".q_proj"),
        "k_proj": _lin(sd, prefix + ".k_proj"),
        "v_proj": _lin(sd, prefix + ".v_proj"),
        "out_proj": _lin(sd, prefix + ".out_proj"),
    }


def _mlp_head(sd, prefix, num_layers):
    return {"layers": [_lin(sd, f"{prefix}.layers.{j}") for j in range(num_layers)]}


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------


def image_encoder_params_from_torch(sd: Dict[str, np.ndarray], ie,
                                    prefix: str = "image_encoder.") -> dict:
    blocks = []
    for i in range(ie.depth):
        p = f"{prefix}blocks.{i}"
        blk = {
            "norm1": _ln(sd, p + ".norm1"),
            "attn": {"qkv": _lin(sd, p + ".attn.qkv"),
                     "proj": _lin(sd, p + ".attn.proj")},
            "norm2": _ln(sd, p + ".norm2"),
            "mlp": {"lin1": _lin(sd, p + ".mlp.lin1"),
                    "lin2": _lin(sd, p + ".mlp.lin2")},
        }
        if ie.use_rel_pos:
            blk["attn"]["rel_pos_h"] = sd[p + ".attn.rel_pos_h"]
            blk["attn"]["rel_pos_w"] = sd[p + ".attn.rel_pos_w"]
        blocks.append(blk)

    params = {
        "patch_embed": _conv(sd, prefix + "patch_embed.proj"),
        "blocks": blocks,
        "neck": {
            "conv1": _conv(sd, prefix + "neck.0", bias=False),
            "ln1": _ln(sd, prefix + "neck.1"),
            "conv2": _conv(sd, prefix + "neck.2", bias=False),
            "ln2": _ln(sd, prefix + "neck.3"),
        },
    }
    if ie.use_abs_pos:
        params["pos_embed"] = sd[prefix + "pos_embed"]
    return params


def prompt_encoder_params_from_torch(sd: Dict[str, np.ndarray],
                                     prefix: str = "prompt_encoder.") -> dict:
    pe = prefix[:-1] if prefix.endswith(".") else prefix
    if pe == "":  # allow bare submodule state dicts
        sd = {"pe." + k: v for k, v in sd.items()}
        pe = "pe"
    return {
        "pe_gaussian": sd[pe + ".pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeddings": np.concatenate(
            [sd[f"{pe}.point_embeddings.{i}.weight"] for i in range(4)], axis=0),
        "not_a_point_embed": sd[pe + ".not_a_point_embed.weight"],
        "no_mask_embed": sd[pe + ".no_mask_embed.weight"],
        "mask_downscaling": {
            "conv1": _conv(sd, pe + ".mask_downscaling.0"),
            "ln1": _ln(sd, pe + ".mask_downscaling.1"),
            "conv2": _conv(sd, pe + ".mask_downscaling.3"),
            "ln2": _ln(sd, pe + ".mask_downscaling.4"),
            "conv3": _conv(sd, pe + ".mask_downscaling.6"),
        },
    }


def mask_decoder_params_from_torch(sd: Dict[str, np.ndarray], md,
                                   prefix: str = "mask_decoder.") -> dict:
    tr = prefix + "transformer"
    layers = []
    for i in range(md.transformer_depth):
        p = f"{tr}.layers.{i}"
        layers.append({
            "self_attn": _attn_downsampled(sd, p + ".self_attn"),
            "norm1": _ln(sd, p + ".norm1"),
            "cross_attn_token_to_image": _attn_downsampled(sd, p + ".cross_attn_token_to_image"),
            "norm2": _ln(sd, p + ".norm2"),
            "mlp": {"lin1": _lin(sd, p + ".mlp.lin1"),
                    "lin2": _lin(sd, p + ".mlp.lin2")},
            "norm3": _ln(sd, p + ".norm3"),
            "norm4": _ln(sd, p + ".norm4"),
            "cross_attn_image_to_token": _attn_downsampled(sd, p + ".cross_attn_image_to_token"),
        })

    nt = md.num_mask_tokens
    hyper_raw = [_mlp_head(sd, f"{prefix}output_hypernetworks_mlps.{i}", 3)
                 for i in range(nt)]
    hyper_stacked = {"layers": [
        {"w": np.stack([hyper_raw[i]["layers"][j]["w"] for i in range(nt)]),
         "b": np.stack([hyper_raw[i]["layers"][j]["b"] for i in range(nt)])}
        for j in range(3)
    ]}

    return {
        "transformer": {
            "layers": layers,
            "final_attn_token_to_image": _attn_downsampled(
                sd, tr + ".final_attn_token_to_image"),
            "norm_final_attn": _ln(sd, tr + ".norm_final_attn"),
        },
        "iou_token": sd[prefix + "iou_token.weight"],
        "mask_tokens": sd[prefix + "mask_tokens.weight"],
        "output_upscaling": {
            "up1": _conv_t(sd, prefix + "output_upscaling.0"),
            "ln": _ln(sd, prefix + "output_upscaling.1"),
            "up2": _conv_t(sd, prefix + "output_upscaling.3"),
        },
        "output_hypernetworks_mlps": hyper_stacked,
        "iou_prediction_head": _mlp_head(sd, prefix + "iou_prediction_head",
                                         md.iou_head_depth),
    }


def sam_params_from_torch(sd: Dict[str, np.ndarray], cfg: SamConfig) -> dict:
    """Convert a full SAM state dict (reference build_sam.py structure)."""
    return {
        "image_encoder": image_encoder_params_from_torch(sd, cfg.image_encoder),
        "prompt_encoder": prompt_encoder_params_from_torch(sd),
        "mask_decoder": mask_decoder_params_from_torch(sd, cfg.mask_decoder),
    }


# ---------------------------------------------------------------------------
# U-Net (reference custom_arcitecture/classic_u_net.py)
# ---------------------------------------------------------------------------


def _double_conv(sd, prefix):
    # Sequential: 0 conv, 1 InstanceNorm, 3 conv, 4 InstanceNorm
    return {
        "conv1": _conv(sd, prefix + ".double_conv.0", bias=False),
        "in1": {"scale": sd[prefix + ".double_conv.1.weight"],
                "bias": sd[prefix + ".double_conv.1.bias"]},
        "conv2": _conv(sd, prefix + ".double_conv.3", bias=False),
        "in2": {"scale": sd[prefix + ".double_conv.4.weight"],
                "bias": sd[prefix + ".double_conv.4.bias"]},
    }


def unet_params_from_torch(sd: Dict[str, np.ndarray], cfg: UNetConfig) -> dict:
    params = {"inc": _double_conv(sd, "inc")}
    for i in range(1, 5):
        params[f"down{i}"] = _double_conv(sd, f"down{i}.maxpool_conv.1")
    for i in range(1, 5):
        up = {"conv": _double_conv(sd, f"up{i}.conv")}
        if not cfg.bilinear:
            up["up"] = _conv_t(sd, f"up{i}.up")
        params[f"up{i}"] = up
    params["outc"] = _conv(sd, "outc.conv")
    return params


def load_reference_unet(path) -> tuple:
    """Load a reference LoadableModel U-Net bundle (``{'config', 'model_state'}``,
    reference custom_arcitecture/modelio.py:67-86) into (UNetConfig, params)."""
    bundle = load_torch_state_dict(path)
    assert isinstance(bundle, dict) and "model_state" in bundle, \
        "not a LoadableModel bundle"
    raw_cfg = bundle["config"]
    cfg = UNetConfig(n_channels=raw_cfg["n_channels"],
                     n_classes=raw_cfg["n_classes"],
                     bilinear=raw_cfg.get("bilinear", False),
                     n_last_channel=raw_cfg.get("n_last_channel", 64))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in bundle["model_state"].items()}
    return cfg, unet_params_from_torch(sd, cfg)
