"""Random affine augmentation (reference unet_training/forward_func.py:37-42).

θ = I + N(0, 1)·strength per sample; the warp reproduces torch
``affine_grid``/``grid_sample`` with ``align_corners=False``, bilinear for
images, nearest for label masks, zero padding.  Pure jnp — fuses into the
jitted train step instead of running as a separate no-grad pass."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def affine_grid(theta: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """theta: (N, 2, 3) -> normalised sampling grid (N, H, W, 2) in xy order
    (torch F.affine_grid, align_corners=False)."""
    h, w = hw
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) * 2 / w - 1
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) * 2 / h - 1
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    base = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # (H, W, 3)
    return jnp.einsum("nij,hwj->nhwi", theta, base)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """x: (N, C, H, W); grid: (N, H', W', 2) normalised xy.  Zero padding,
    align_corners=False (torch F.grid_sample semantics).

    TPU note: taps are fetched with ``take_along_axis`` over the *linearised*
    spatial axis — XLA lowers that to an efficient 1-D gather, whereas 2-D
    advanced indexing produced a general gather that dominated the whole
    train step (~1.8 s/step measured on v5e)."""
    n, c, h, w = x.shape
    oh, ow = grid.shape[1:3]
    gx = (grid[..., 0] + 1) * w / 2 - 0.5
    gy = (grid[..., 1] + 1) * h / 2 - 0.5
    flat = x.reshape(n, c, h * w)

    def gather(yi, xi):
        """(N, H', W') integer taps -> (N, C, H', W'); zero outside bounds."""
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        lin = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
        lin = lin.reshape(n, 1, oh * ow)
        vals = jnp.take_along_axis(flat, jnp.broadcast_to(lin, (n, c, oh * ow)),
                                   axis=2)
        return vals.reshape(n, c, oh, ow) * valid[:, None]

    if mode == "nearest":
        return gather(jnp.round(gy).astype(jnp.int32),
                      jnp.round(gx).astype(jnp.int32))

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def random_affine(key, x: jnp.ndarray, y: jnp.ndarray, strength: float,
                  use_pallas: bool = False):
    """Apply the reference's augmentation: one random affine per sample,
    bilinear on images, nearest on masks (forward_func.py:37-42).

    ``use_pallas`` routes the warp through the fused VMEM-gather kernel
    (kernels/warp.py) — XLA's HBM gather path costs ~480 ms per training step
    on TPU for these shapes."""
    n = x.shape[0]
    theta = (jnp.eye(2, 3)[None]
             + jax.random.normal(key, (n, 2, 3)) * strength)
    if use_pallas:
        from samcarriestheburden_tpu.kernels.warp import affine_warp

        return affine_warp(x, theta, "bilinear"), affine_warp(y, theta, "nearest")
    grid = affine_grid(theta, x.shape[-2:])
    return grid_sample(x, grid, "bilinear"), grid_sample(y, grid, "nearest")
