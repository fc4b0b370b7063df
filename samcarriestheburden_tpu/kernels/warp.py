"""Fused affine-warp (grid_sample) Pallas kernel.

The training augmentation (reference forward_func.py:37-42) is a per-sample
affine warp.  XLA lowers the bilinear taps to HBM gathers that cost ~480 ms
per (16, 18, 384, 224) step on v5e — 4× the whole U-Net fwd+bwd.  This kernel
keeps each sample's channels in VMEM and performs the taps as in-VMEM dynamic
gathers over the flattened spatial axis.

Mosaic constraints shaped the implementation (all discovered on hardware):
* SMEM loads are scalar-only → the 2×3 theta is read element-wise;
* ``tpu.iota`` is integer-only → float grids come from int iota + cast;
* reshapes that merge an unaligned lane dim (W=224) are unsupported → the
  kernel works **entirely in flattened (·, H·W) form**, deriving row/col from
  a flat iota with div/mod; callers pass/receive (N, C, H·W);
* ``dynamic_gather`` needs identical 2-D operand/index shapes and mis-lowers
  a leading dim of 1 → single-channel images are gathered as 2 rows.

Semantics match torch ``affine_grid``+``grid_sample`` with
``align_corners=False`` and zero padding: bilinear for images, nearest for
label masks.

STATUS: interpret-mode verified; **not yet runnable on hardware** — Mosaic's
``tpu.dynamic_gather`` only permutes lanes within a single vreg ("Multiple
source vregs along gather dimension"), so a whole-image gather cannot lower.
The trainer keeps the XLA gather path; revisit with a row-band DMA + in-band
gather formulation (or await Mosaic cross-vreg gather support).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(theta_ref, img_ref, out_ref, *, h: int, w: int, mode: str):
    c = img_ref.shape[1]
    hw = h * w
    # SMEM loads must be scalar on hardware: read the 2x3 theta element-wise
    t00 = theta_ref[0, 0, 0]
    t01 = theta_ref[0, 0, 1]
    t02 = theta_ref[0, 0, 2]
    t10 = theta_ref[0, 1, 0]
    t11 = theta_ref[0, 1, 1]
    t12 = theta_ref[0, 1, 2]

    # flat output grid; row/col via div/mod (no 2-D<->flat reshapes in-kernel)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    row = (q // w).astype(jnp.float32)
    col = (q % w).astype(jnp.float32)
    # normalised coords, align_corners=False (torch affine_grid)
    xs = (col + 0.5) * 2 / w - 1
    ys = (row + 0.5) * 2 / h - 1
    gx_n = t00 * xs + t01 * ys + t02
    gy_n = t10 * xs + t11 * ys + t12
    # normalised -> pixel coords (grid_sample, align_corners=False)
    gx = (gx_n + 1) * w / 2 - 0.5
    gy = (gy_n + 1) * h / 2 - 0.5

    # Mosaic's dynamic_gather mis-lowers a leading dim of 1: gather 2 rows
    cg = max(c, 2)
    img_flat = img_ref[0]  # (c, hw)
    if c == 1:
        img_flat = jnp.concatenate([img_flat, img_flat], axis=0)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # (1, hw)
        idx = jnp.broadcast_to(lin, (cg, hw))
        vals = jnp.take_along_axis(img_flat, idx, axis=1)[:c]
        return vals * valid.astype(img_flat.dtype)

    if mode == "nearest":
        out = tap(jnp.round(gy).astype(jnp.int32), jnp.round(gx).astype(jnp.int32))
    else:
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = gx - x0
        fy = gy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        out = (tap(y0i, x0i) * (1 - fy) * (1 - fx)
               + tap(y0i, x0i + 1) * (1 - fy) * fx
               + tap(y0i + 1, x0i) * fy * (1 - fx)
               + tap(y0i + 1, x0i + 1) * fy * fx)
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("mode", "interpret"))
def affine_warp(x: jnp.ndarray, theta: jnp.ndarray, mode: str = "bilinear",
                interpret: bool = False) -> jnp.ndarray:
    """x: (N, C, H, W); theta: (N, 2, 3) torch affine_grid convention.
    Returns the warped batch (zero padding outside)."""
    n, c, h, w = x.shape
    x_flat = x.reshape(n, c, h * w)
    out = pl.pallas_call(
        partial(_warp_kernel, h=h, w=w, mode=mode),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h * w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, h * w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x_flat.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(theta, x_flat)
    return out.reshape(n, c, h, w)
