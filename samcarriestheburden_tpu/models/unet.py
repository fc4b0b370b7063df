"""Classic 4-down/4-up U-Net, functional
(reference custom_arcitecture/classic_u_net.py, milesial lineage).

Per-block: conv3×3(no bias) → InstanceNorm(affine) → LeakyReLU(0.01), twice.
Down: 2×2 max-pool + double conv.  Up: transposed conv (or bilinear
align-corners upsample) + pad-to-match + skip concat.  NHWC internally; NCHW
at the API boundary.  The whole forward jits into one XLA program; gradient
checkpointing (the reference's ``use_checkpointing``, classic_u_net.py:121)
maps to ``jax.checkpoint`` over the double-conv blocks via ``remat=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.config import UNetConfig
from samcarriestheburden_tpu.models.common import (
    conv2d, conv2d_init, conv2d_transpose, conv_transpose_init, instance_norm,
    instance_norm_init)


def _leaky_relu(x):
    # explicit formula: jax.nn.leaky_relu is a custom_jvp closed call that
    # trips a jax-0.9 lowering-cache KeyError when an epoch-scan also contains
    # a Pallas kernel (mlir._lower_jaxpr_to_fun_cached 'closed_call')
    return jnp.where(x >= 0, x, 0.01 * x)


def _double_conv_init(key, in_ch, out_ch, mid_ch=None):
    mid_ch = mid_ch or out_ch
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv2d_init(k1, in_ch, mid_ch, (3, 3), bias=False),
        "in1": instance_norm_init(mid_ch),
        "conv2": conv2d_init(k2, mid_ch, out_ch, (3, 3), bias=False),
        "in2": instance_norm_init(out_ch),
    }


def _double_conv(p, x):
    x = _leaky_relu(instance_norm(p["in1"], conv2d(p["conv1"], x)))
    x = _leaky_relu(instance_norm(p["in2"], conv2d(p["conv2"], x)))
    return x


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


def _upsample_bilinear_align_corners(x, factor=2):
    """torch Upsample(scale_factor=2, mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    oh, ow = h * factor, w * factor

    def src(out_n, in_n):
        if out_n == 1:
            return jnp.zeros((1,))
        return jnp.arange(out_n) * (in_n - 1) / (out_n - 1)

    def interp_axis(arr, axis, out_n, in_n):
        coords = src(out_n, in_n)
        lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_n - 1)
        hi = jnp.clip(lo + 1, 0, in_n - 1)
        frac = (coords - lo).reshape([-1 if i == axis else 1 for i in range(arr.ndim)])
        return (jnp.take(arr, lo, axis=axis) * (1 - frac)
                + jnp.take(arr, hi, axis=axis) * frac)

    x = interp_axis(x, 1, oh, h)
    x = interp_axis(x, 2, ow, w)
    return x


def init(key, cfg: UNetConfig) -> dict:
    bc = cfg.base_channels
    factor = 2 if cfg.bilinear else 1
    ks = jax.random.split(key, 14)
    params = {
        "inc": _double_conv_init(ks[0], cfg.n_channels, bc),
        "down1": _double_conv_init(ks[1], bc, bc * 2),
        "down2": _double_conv_init(ks[2], bc * 2, bc * 4),
        "down3": _double_conv_init(ks[3], bc * 4, bc * 8),
        "down4": _double_conv_init(ks[4], bc * 8, bc * 16 // factor),
        "outc": conv2d_init(ks[5], cfg.n_last_channel, cfg.n_classes, (1, 1)),
    }
    up_specs = [  # (in_total, out)
        (bc * 16, bc * 8 // factor),
        (bc * 8, bc * 4 // factor),
        (bc * 4, bc * 2 // factor),
        (bc * 2, cfg.n_last_channel),
    ]
    for i, (cin, cout) in enumerate(up_specs, start=1):
        kk = ks[5 + i * 2], ks[6 + i * 2]
        up = {}
        if cfg.bilinear:
            up["conv"] = _double_conv_init(kk[0], cin, cout, cin // 2)
        else:
            up["up"] = conv_transpose_init(kk[0], cin, cin // 2, (2, 2))
            up["conv"] = _double_conv_init(kk[1], cin, cout)
        params[f"up{i}"] = up
    return params


def _up_block(p, x1, x2, bilinear: bool):
    """Upscale x1, pad to x2's spatial dims, concat [x2, x1], double conv
    (reference classic_u_net.py:57-69)."""
    if bilinear:
        x1 = _upsample_bilinear_align_corners(x1)
    else:
        x1 = conv2d_transpose(p["up"], x1, (2, 2))
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    x1 = jnp.pad(x1, [(0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)])
    x = jnp.concatenate([x2, x1], axis=-1)
    return _double_conv(p["conv"], x)


def apply(params: dict, cfg: UNetConfig, x: jnp.ndarray, *,
          remat: bool = False) -> jnp.ndarray:
    """(B, n_channels, H, W) NCHW -> (B, n_classes, H, W) logits."""
    dc = jax.checkpoint(_double_conv, static_argnums=()) if remat else _double_conv
    x = jnp.transpose(x, (0, 2, 3, 1))
    x1 = dc(params["inc"], x)
    x2 = dc(params["down1"], _maxpool2(x1))
    x3 = dc(params["down2"], _maxpool2(x2))
    x4 = dc(params["down3"], _maxpool2(x3))
    x5 = dc(params["down4"], _maxpool2(x4))
    y = _up_block(params["up1"], x5, x4, cfg.bilinear)
    y = _up_block(params["up2"], y, x3, cfg.bilinear)
    y = _up_block(params["up3"], y, x2, cfg.bilinear)
    y = _up_block(params["up4"], y, x1, cfg.bilinear)
    logits = conv2d(params["outc"], y)
    return jnp.transpose(logits, (0, 3, 1, 2))
