"""Int8 variants of the encoder's fused matmul kernels (prequantized weights).

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate — measured on this
chip: a (19600, 1280) @ (1280, 5120) dot is 1333 us bf16 vs 686 us int8
(tools/exp_int8.py), i.e. ~98% of either peak.  The encoder's compute floor
is its matmuls, so int8 is the step-change lever for single-chip throughput.
This is an OPT-IN serving mode — the reference itself ships a dynamically-
uint8-quantized deployment artifact for its decoder
(scripts/export_onnx_model.py:187-201) — but bf16 remains the parity default.

Scheme (standard dynamic PTQ):
* weights: symmetric per-output-channel int8 (absmax / 127), quantized ONCE
  outside the serving loop (models/quantize.prequantize_image_encoder —
  round 2 quantized per call, which re-scanned ViT-H's 0.6B params every
  forward and ate the MXU gain);
* activations: symmetric per-row (per-token) int8, computed in-kernel after
  the LayerNorm; the MLP hidden activation is re-quantized per row between
  the two dots (hidden-dim chunking was benchmarked and removed — it only
  tied the single-chunk kernel on v5e, see BENCHMARKS negative-results);
* accumulation int32 on the MXU; dequantise with the rank-1 outer product of
  row and channel scales; LN statistics, GELU and residuals stay fp32.

The row quant needs no clip: with s = absmax/127 the scaled magnitudes are
<= 127*(1 + ~1e-7), which round-to-nearest maps to 127.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samcarriestheburden_tpu.kernels.mlp import _erf


def quantize_weight(w: jnp.ndarray):
    """(I, O) -> int8 weights + (1, O) fp32 per-output-channel scales."""
    scale = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                                keepdims=True), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return wq.astype(jnp.int8), scale


def _row_quant(x: jnp.ndarray):
    """fp32 (T, I) -> int8 rows + (T, 1) fp32 scales (symmetric absmax)."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.round(x / s).astype(jnp.int8), s


def _int8_dot(xq, wq):
    return jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


#: odd-polynomial Phi(x) = 0.5(1+erf(x/sqrt2)) fit (deg 13 on [0, 4.5],
#: clip-saturated tails; max |gelu error| 6.7e-4 — ~60x below the int8
#: per-token quant noise).  Pure FMA: no exp/divide, which the erf form
#: needs and which are what make the int8 kernel VPU-bound (the bf16 kernel
#: hides the same erf under its 2x-longer MXU occupancy; measured
#: tools/exp_int8.py: erf 2231 us vs poly 1726 us vs bf16 2916 us).
_PHI_POLY = (1.0962050526e-08, -9.3423034307e-07, 3.3436889582e-05,
             -6.5934551371e-04, 7.9518464564e-03, -6.2628257803e-02,
             3.9645120080e-01)


def _gelu(h: jnp.ndarray, impl: str) -> jnp.ndarray:
    if impl == "erf":
        return 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    assert impl == "poly", impl
    u = h * h
    p = _PHI_POLY[0]
    for c in _PHI_POLY[1:]:
        p = p * u + c
    return h * jnp.clip(0.5 + h * p, 0.0, 1.0)


def _ln_mlp_kernel_q(*refs, eps: float, has_add: bool, gelu: str):
    if has_add:
        (x_ref, a_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
         w2_ref, s2_ref, b2_ref, o_ref) = refs
    else:
        (x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
         w2_ref, s2_ref, b2_ref, o_ref) = refs
    xf = x_ref[:].astype(jnp.float32)
    if has_add:
        xf = xf + a_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    xq, sx = _row_quant(xn)
    h = _int8_dot(xq, w1_ref[:]).astype(jnp.float32)
    h = h * (sx * s1_ref[0]) + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu)
    hq, sh = _row_quant(h)
    y = _int8_dot(hq, w2_ref[:]).astype(jnp.float32) * (sh * s2_ref[0])
    o_ref[:] = (xf + y + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("t_block", "eps", "gelu", "interpret"))
def fused_ln_mlp_residual_int8(x, ln_scale, ln_bias, w1q, s1, b1, w2q, s2, b2,
                               add: Optional[jnp.ndarray] = None,
                               *, t_block: Optional[int] = None,
                               eps: float = 1e-6,
                               gelu: str = "poly",
                               interpret: bool = False) -> jnp.ndarray:
    """Int8 analogue of kernels.mlp.fused_ln_mlp_residual.
    w1q (E, M) int8 + s1 (1, M); w2q (M, E) int8 + s2 (1, E); ``add`` folds
    the block's attention residual in-kernel like the bf16 variant.
    ``gelu='poly'`` (default) uses the FMA-only Phi polynomial — the erf
    form keeps the int8 kernel VPU-bound (see _PHI_POLY note).  A hidden-dim
    chunked variant (per-(row, chunk) quantization) was benchmarked and
    removed: 2/4 chunks only tie the single-chunk kernel on v5e (BENCHMARKS
    negative-results; tools/exp_mlp2.py keeps a standalone copy), and the
    arithmetic would diverge from the ln_mlp_residual_int8_xla mirror the
    end-to-end accuracy gate validates."""
    t, e = x.shape
    m = w1q.shape[1]
    if t_block is None:
        t_block = min(512, t)  # v5e sweep: 512 beats 256 for the int8 kernel
    grid = (pl.cdiv(t, t_block),)
    x_spec = pl.BlockSpec((t_block, e), lambda i: (i, 0))
    in_specs = [x_spec] + ([x_spec] if add is not None else []) + [
        pl.BlockSpec((1, e), lambda i: (0, 0)),
        pl.BlockSpec((1, e), lambda i: (0, 0)),
        pl.BlockSpec((e, m), lambda i: (0, 0)),
        pl.BlockSpec((1, m), lambda i: (0, 0)),
        pl.BlockSpec((1, m), lambda i: (0, 0)),
        pl.BlockSpec((m, e), lambda i: (0, 0)),
        pl.BlockSpec((1, e), lambda i: (0, 0)),
        pl.BlockSpec((1, e), lambda i: (0, 0)),
    ]
    operands = (x,) + ((add.astype(x.dtype),) if add is not None else ()) + (
        ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
        w1q, s1.reshape(1, -1), b1.reshape(1, -1),
        w2q, s2.reshape(1, -1), b2.reshape(1, -1))
    return pl.pallas_call(
        partial(_ln_mlp_kernel_q, eps=eps,
                has_add=add is not None, gelu=gelu),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_block, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * e * m * 2, transcendentals=t * m,
            bytes_accessed=2 * t * e * x.dtype.itemsize + e * m * 2),
        interpret=interpret,
    )(*operands)


def _ln_linear_kernel_q(x_ref, m_ref, g_ref, b_ref, w_ref, s_ref, bw_ref,
                        o_ref, *, eps: float):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    xn = xn * m_ref[:].astype(jnp.float32)
    xq, sx = _row_quant(xn)
    y = _int8_dot(xq, w_ref[:]).astype(jnp.float32)
    y = y * (sx * s_ref[0]) + bw_ref[0].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("t_block", "eps", "interpret"))
def fused_ln_masked_linear_int8(x, mask, ln_scale, ln_bias, wq, s, b, *,
                                t_block: Optional[int] = None,
                                eps: float = 1e-6,
                                interpret: bool = False) -> jnp.ndarray:
    """Int8 analogue of kernels.mlp.fused_ln_masked_linear (qkv projection);
    wq/s from models.quantize (prequantized, head-major-packed)."""
    t, e = x.shape
    o = wq.shape[1]
    if t_block is None:
        t_block = min(256, t)
    grid = (pl.cdiv(t, t_block),)
    return pl.pallas_call(
        partial(_ln_linear_kernel_q, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_block, e), lambda i: (i, 0)),
            pl.BlockSpec((t_block, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((e, o), lambda i: (0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t_block, o), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * e * o, transcendentals=0,
            bytes_accessed=t * (e + o) * x.dtype.itemsize + e * o),
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
      wq, s.reshape(1, -1), b.reshape(1, -1))


# ---------------------------------------------------------------------------
# Pure-jnp mirrors of the int8 kernels (CPU-runnable reference path)
# ---------------------------------------------------------------------------


def ln_mlp_residual_int8_xla(x, ln_scale, ln_bias, w1q, s1, b1, w2q, s2, b2,
                             add=None, *, eps: float = 1e-6,
                             gelu: str = "poly") -> jnp.ndarray:
    """Same arithmetic as fused_ln_mlp_residual_int8 in plain jnp ops (int32
    MXU dots included): the quantization error model is identical, so this is
    the CPU-runnable reference for end-to-end int8 accuracy gates
    (tests/test_quantize.py) — Mosaic kernels need hardware or the (orders-
    of-magnitude slower) interpreter."""
    xf = x.astype(jnp.float32)
    if add is not None:
        # fused_ln_mlp_residual_int8 ships `add` to the kernel in x.dtype
        # (one operand layout); round the same way so kernel == mirror stays
        # bit-equivalent by construction even for mixed-dtype callers.
        xf = xf + add.astype(x.dtype).astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.reshape(1, -1) + ln_bias.reshape(1, -1)
    xq, sx = _row_quant(xn)
    h = _int8_dot(xq, w1q).astype(jnp.float32)
    h = h * (sx * s1.reshape(1, -1)) + b1.reshape(1, -1)
    h = _gelu(h, gelu)
    hq, sh = _row_quant(h)
    y = _int8_dot(hq, w2q).astype(jnp.float32)
    y = y * (sh * s2.reshape(1, -1)) + b2.reshape(1, -1)
    return (xf + y).astype(x.dtype)


def ln_masked_linear_int8_xla(x, mask, ln_scale, ln_bias, wq, s, b, *,
                              eps: float = 1e-6) -> jnp.ndarray:
    """jnp mirror of fused_ln_masked_linear_int8 (see above)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.reshape(1, -1) + ln_bias.reshape(1, -1)
    xn = xn * mask.astype(jnp.float32)
    xq, sx = _row_quant(xn)
    y = _int8_dot(xq, wq).astype(jnp.float32)
    y = y * (sx * s.reshape(1, -1)) + b.reshape(1, -1)
    return y.astype(x.dtype)
