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


def grid_sample_matmul(x: jnp.ndarray, grid: jnp.ndarray,
                       mode: str = "bilinear", row_block: int = 16) -> jnp.ndarray:
    """``grid_sample`` with ZERO gathers: the sampling operator is expressed
    as two dense contractions against analytically-built weight matrices.

    Bilinear weights factor per axis — the weight of input pixel (y, x) at
    sample position (gy, gx) is ``hat(gy−y)·hat(gx−x)`` with
    ``hat(t) = max(0, 1−|t|)`` — so the 2-D warp is exactly

        out[n,c,i,j] = Σ_y hat(gy−y) · Σ_x hat(gx−x) · x[n,c,y,x]

    two matmuls whose weights come from ``iota``, not memory.  Nearest mode
    uses one-hot (δ) weights, which copy values exactly (fp32 preserves
    integers < 2²⁴, enabling the bit-packed multilabel warp in
    ``random_affine``).  Out-of-range samples get all-zero weight rows ==
    torch's ``padding_mode='zeros'``.

    XLA lowers the 4-tap formulation to a general gather that runs at
    ~0.2 G elem/s on TPU (~480 ms/train-step for the reference shapes); this
    formulation is pure MXU work (~240 GF per 1-channel 384×224 batch-16
    warp) and runs in single-digit ms.  Output rows are processed in
    ``row_block``-row blocks under ``lax.map`` to bound the weight/intermediate
    footprint (wy per block: N·R·W′·H floats)."""
    n, c, h, w = x.shape
    oh, ow = grid.shape[1:3]
    gx = (grid[..., 0] + 1) * w / 2 - 0.5
    gy = (grid[..., 1] + 1) * h / 2 - 0.5
    pad = (-oh) % row_block
    if pad:
        gx = jnp.pad(gx, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0)
        gy = jnp.pad(gy, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0)
    nb = (oh + pad) // row_block
    gxb = gx.reshape(n, nb, row_block, ow).transpose(1, 0, 2, 3)  # (NB,N,R,OW)
    gyb = gy.reshape(n, nb, row_block, ow).transpose(1, 0, 2, 3)
    ys = jnp.arange(h, dtype=x.dtype)
    xs = jnp.arange(w, dtype=x.dtype)

    def block(g):
        gyk, gxk = g  # (N, R, OW)
        if mode == "bilinear":
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(gyk[..., None] - ys))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(gxk[..., None] - xs))
        elif mode == "nearest":
            wy = (jnp.round(gyk)[..., None] == ys).astype(x.dtype)
            wx = (jnp.round(gxk)[..., None] == xs).astype(x.dtype)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        s = jnp.einsum("nrjy,ncyx->ncrjx", wy, x,
                       preferred_element_type=x.dtype)
        return jnp.einsum("ncrjx,nrjx->ncrj", s, wx,
                          preferred_element_type=x.dtype)

    out = jax.lax.map(block, (gyb, gxb))           # (NB, N, C, R, OW)
    out = out.transpose(1, 2, 0, 3, 4).reshape(n, c, oh + pad, ow)
    return out[:, :, :oh] if pad else out


def warp_affine(x: jnp.ndarray, y: jnp.ndarray, theta: jnp.ndarray,
                method: str = "matmul"):
    """Warp images (bilinear) + label masks (nearest) by per-sample affines.

    ``method``:
      * ``"matmul"`` (default, TPU fast path) — gather-free
        ``grid_sample_matmul``; the label channels, which must be binary, are
        bit-packed into ONE float32 plane (nearest δ-weights copy integers
        exactly) so the mask warp costs 1 channel instead of 17.
      * ``"gather"`` — the 4-tap ``take_along_axis`` formulation (exact
        reference semantics, fast on CPU, slow on TPU).

    (A fused Pallas warp kernel was tried in round 2 and removed: Mosaic's
    ``dynamic_gather`` is single-vreg-only so it could never lower to
    hardware, and the matmul formulation already erased the augmentation tax
    — 138 ms/step augmented == plain, BENCHMARKS.md.)
    """
    if method not in ("matmul", "gather"):
        raise ValueError(
            f"Unknown warp method {method!r}: use 'matmul' or 'gather' "
            "(the round-2 'pallas' kernel was removed — Mosaic's "
            "dynamic_gather cannot lower it; 'matmul' is its replacement)")
    grid = affine_grid(theta, x.shape[-2:])
    if method == "gather":
        return grid_sample(x, grid, "bilinear"), grid_sample(y, grid, "nearest")
    xw = grid_sample_matmul(x, grid, "bilinear")
    nc = y.shape[1]
    if nc <= 23:  # packed values < 2^23 stay exact through fp32 matmuls
        weights = (2.0 ** jnp.arange(nc, dtype=jnp.float32)).reshape(1, nc, 1, 1)
        packed = jnp.sum(y.astype(jnp.float32) * weights, axis=1, keepdims=True)
        pw = grid_sample_matmul(packed, grid, "nearest").astype(jnp.int32)
        bits = (pw >> jnp.arange(nc, dtype=jnp.int32).reshape(1, nc, 1, 1)) & 1
        yw = bits.astype(y.dtype)
    else:
        yw = grid_sample_matmul(y, grid, "nearest")
    return xw, yw


def random_affine(key, x: jnp.ndarray, y: jnp.ndarray, strength: float,
                  method: str = "matmul"):
    """Apply the reference's augmentation: one random affine per sample,
    bilinear on images, nearest on masks (forward_func.py:37-42)."""
    n = x.shape[0]
    theta = (jnp.eye(2, 3)[None]
             + jax.random.normal(key, (n, 2, 3)) * strength)
    return warp_affine(x, y, theta, method=method)
