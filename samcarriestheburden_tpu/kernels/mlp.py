"""Fused transformer-MLP kernel: ``x + lin2(gelu(lin1(LN(x))))`` in one pass.

The XLA lowering of the encoder MLP materialises the (tokens, 4E)
intermediate in HBM twice (lin1 write + lin2 read ≈ 400 MB per ViT-H block
at batch 4) plus the LN round-trip.  Here the intermediate lives in VMEM per
token block and the weights stay resident across the grid, so HBM traffic is
one x read + one y write + one weight load (~126 MB/block).

Numerics: LN statistics and both matmul accumulations in fp32, GELU exact
(erf) like the reference (modeling/common.py:13-26); output in x.dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 erf for Mosaic (neither erf nor erfc lower to TPU Pallas yet):
    Abramowitz & Stegun 7.1.26, |error| <= 1.5e-7 — at fp32 resolution for
    GELU's argument range."""
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _mlp_core(xf, dt, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
              eps: float):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    h = jax.lax.dot_general(xn.astype(dt), w1_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))  # exact-erf GELU

    y = jax.lax.dot_general(h.astype(dt), w2_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    o_ref[:] = (xf + y).astype(o_ref.dtype)


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                eps: float):
    x = x_ref[:]
    _mlp_core(x.astype(jnp.float32), x.dtype, g_ref, b_ref, w1_ref, b1_ref,
              w2_ref, b2_ref, o_ref, eps)


def _mlp_add_kernel(x_ref, a_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, o_ref, *, eps: float):
    """Variant with the attention residual folded in: s = x + a, then
    s + mlp(LN(s)) — saves materialising s in HBM between the attention
    projection and the block MLP."""
    x = x_ref[:]
    s = x.astype(jnp.float32) + a_ref[:].astype(jnp.float32)
    _mlp_core(s, x.dtype, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              o_ref, eps)


@partial(jax.jit, static_argnames=("t_block", "eps", "interpret"))
def fused_ln_mlp_residual(x: jnp.ndarray, ln_scale, ln_bias, w1, b1, w2, b2,
                          add: Optional[jnp.ndarray] = None,
                          *, t_block: Optional[int] = None, eps: float = 1e-6,
                          interpret: bool = False) -> jnp.ndarray:
    """x: (T, E) tokens -> (T, E) == x + mlp(LN(x)).  Weights: w1 (E, M),
    w2 (M, E); biases (M,)/(E,); LN affine (E,).  With ``add`` (T, E), the
    input is first summed in-kernel: (x+add) + mlp(LN(x+add)) — the block's
    attention residual never round-trips HBM."""
    t, e = x.shape
    m = w1.shape[1]
    if t_block is None:
        t_block = min(256, t)  # v5e sweep: 256 beats 512/1024 at ViT-H shapes
    grid = (pl.cdiv(t, t_block),)
    x_spec = pl.BlockSpec((t_block, e), lambda i: (i, 0))
    w_specs = [
        pl.BlockSpec((1, e), lambda i: (0, 0)),
        pl.BlockSpec((1, e), lambda i: (0, 0)),
        pl.BlockSpec((e, m), lambda i: (0, 0)),
        pl.BlockSpec((1, m), lambda i: (0, 0)),
        pl.BlockSpec((m, e), lambda i: (0, 0)),
        pl.BlockSpec((1, e), lambda i: (0, 0)),
    ]
    kernel = partial(_mlp_add_kernel if add is not None else _mlp_kernel,
                     eps=eps)
    in_specs = [x_spec] + ([x_spec] if add is not None else []) + w_specs
    operands = (x,) + ((add,) if add is not None else ()) + (
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
        w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_block, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * e * m * 2, transcendentals=t * m,
            bytes_accessed=(2 * t * e + 2 * e * m) * x.dtype.itemsize),
        interpret=interpret,
    )(*operands)


def _ln_linear_kernel(x_ref, m_ref, g_ref, b_ref, w_ref, bw_ref, o_ref, *,
                      eps: float):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    xn = xn * m_ref[:].astype(jnp.float32)          # pad-slot re-zeroing
    y = jax.lax.dot_general(xn.astype(x.dtype), w_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = (y + bw_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("t_block", "eps", "interpret"))
def fused_ln_masked_linear(x: jnp.ndarray, mask: jnp.ndarray, ln_scale,
                           ln_bias, w, b, *, t_block: Optional[int] = None,
                           eps: float = 1e-6,
                           interpret: bool = False) -> jnp.ndarray:
    """``(LN(x) * mask) @ w + b`` in one pass — the windowed-block qkv
    projection with the pad re-zeroing (image_encoder._block_apply_windowed)
    folded in.  x: (T, E); mask: (T, 1); w: (E, O) -> (T, O)."""
    t, e = x.shape
    o = w.shape[1]
    if t_block is None:
        t_block = min(256, t)
    grid = (pl.cdiv(t, t_block),)
    return pl.pallas_call(
        partial(_ln_linear_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_block, e), lambda i: (i, 0)),
            pl.BlockSpec((t_block, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((e, o), lambda i: (0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t_block, o), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * e * o, transcendentals=0,
            bytes_accessed=(t * (e + o) + e * o) * x.dtype.itemsize),
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
      w, b.reshape(1, -1))


def mlp_residual_apply(p_norm: dict, p_mlp: dict, x: jnp.ndarray,
                       eps: float = 1e-6, interpret: bool = False,
                       add: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Drop-in for ``x + mlp_block(p_mlp, layer_norm(p_norm, x))`` on token
    grids of any leading shape (with ``add``: x := x + add first)."""
    lead = x.shape[:-1]
    e = x.shape[-1]
    y = fused_ln_mlp_residual(
        x.reshape(-1, e), p_norm["scale"], p_norm["bias"],
        p_mlp["lin1"]["w"].astype(x.dtype), p_mlp["lin1"]["b"],
        p_mlp["lin2"]["w"].astype(x.dtype), p_mlp["lin2"]["b"],
        add.reshape(-1, e).astype(x.dtype) if add is not None else None,
        eps=eps, interpret=interpret)
    return y.reshape(*lead, e)
