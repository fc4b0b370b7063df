"""Shared functional NN blocks.

Covers the reference's ``segment_anything/modeling/common.py`` (MLPBlock,
LayerNorm2d) plus the linear/conv/norm primitives every model here builds on.

Conventions:
* params are nested dicts of ``jnp.ndarray``;
* linear weights are stored ``(in, out)`` and conv weights ``HWIO`` — the
  natural layouts for TPU matmuls; the torch checkpoint converter transposes;
* images flow **NHWC** internally (TPU-native); NCHW only at API boundaries;
* initialisers mirror torch defaults (Kaiming-uniform fan-in) so from-scratch
  training matches the reference's behaviour.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initialisers (torch-default compatible)
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch nn.Linear/Conv2d default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3)*gain...
    # torch uses kaiming_uniform_(a=sqrt(5)) => bound = sqrt(6/((1+5)*fan_in)) = 1/sqrt(fan_in)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = _kaiming_uniform(kb, (out_dim,), in_dim)
    return p


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_init(key, in_ch: int, out_ch: int, kernel_hw: Tuple[int, int],
                bias: bool = True) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_hw[0] * kernel_hw[1]
    p = {"w": _kaiming_uniform(kw, (*kernel_hw, in_ch, out_ch), fan_in)}  # HWIO
    if bias:
        p["b"] = _kaiming_uniform(kb, (out_ch,), fan_in)
    return p


def conv2d(p: dict, x: jnp.ndarray, stride: Tuple[int, int] = (1, 1),
           padding="SAME") -> jnp.ndarray:
    """NHWC conv (cross-correlation, torch-compatible)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_transpose(p: dict, x: jnp.ndarray, stride: Tuple[int, int]) -> jnp.ndarray:
    """NHWC transposed conv, torch ``ConvTranspose2d(k, stride=k)`` semantics.

    Weights stored HWIO with I=input-channels of the *forward* direction, i.e.
    the torch layout (in, out, kh, kw) converted to (kh, kw, in, out); we run
    it as the gradient/transpose of a stride-``stride`` conv.
    """
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=stride, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose_init(key, in_ch: int, out_ch: int, kernel_hw: Tuple[int, int],
                        bias: bool = True) -> dict:
    kw, kb = jax.random.split(key)
    # torch ConvTranspose2d fan_in = out_ch * prod(kernel) (weight shape (in, out, kh, kw))
    fan_in = out_ch * kernel_hw[0] * kernel_hw[1]
    p = {"w": _kaiming_uniform(kw, (*kernel_hw, in_ch, out_ch), fan_in)}
    if bias:
        p["b"] = _kaiming_uniform(kb, (out_ch,), fan_in)
    return p


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis (fp32 statistics regardless of x dtype)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def layer_norm_2d(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """The reference's LayerNorm2d (modeling/common.py:31-43): per-pixel
    normalisation over the channel axis.  Here x is NHWC so it's just a
    last-axis LayerNorm with biased variance — identical math."""
    return layer_norm(p, x, eps)


def instance_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def instance_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d(affine=True) on NHWC: normalise each (sample,
    channel) over its spatial extent (reference classic_u_net.py:18)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(-3, -2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations / blocks
# ---------------------------------------------------------------------------


def fast_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU with erf evaluated by the Abramowitz & Stegun 7.1.26
    polynomial (|erf error| <= 1.5e-7 — below fp32 resolution at GELU's
    scales).  XLA lowers ``erf`` itself through ``erfc``, which measured
    ~4x slower than the exp this polynomial needs on TPU VPUs; use this on
    serving paths, ``gelu`` for strict torch parity."""
    xf = x.astype(jnp.float32)
    a = jnp.abs(xf) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(xf) * (1.0 - poly * jnp.exp(-a * a))
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch ``nn.GELU()`` default, which all SAM modules
    use.  (jax.nn.gelu defaults to the tanh approximation; don't.)"""
    return jax.nn.gelu(x, approximate=False)


def mlp_block_init(key, embedding_dim: int, mlp_dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"lin1": linear_init(k1, embedding_dim, mlp_dim),
            "lin2": linear_init(k2, mlp_dim, embedding_dim)}


def mlp_block(p: dict, x: jnp.ndarray, act=gelu) -> jnp.ndarray:
    """lin → act → lin (reference modeling/common.py:13-26)."""
    return linear(p["lin2"], act(linear(p["lin1"], x)))


def mlp_init(key, input_dim: int, hidden_dim: int, output_dim: int,
             num_layers: int) -> dict:
    """The decoder's MLP head (reference mask_decoder.py:154-176)."""
    dims = [input_dim] + [hidden_dim] * (num_layers - 1) + [output_dim]
    keys = jax.random.split(key, num_layers)
    return {"layers": [linear_init(k, dims[i], dims[i + 1])
                       for i, k in enumerate(keys)]}


def mlp(p: dict, x: jnp.ndarray, sigmoid_output: bool = False) -> jnp.ndarray:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x
