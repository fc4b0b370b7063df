"""Fused ViTDet attention kernel (Pallas/Mosaic).

Computes ``softmax(q·kᵀ·scale + rel_bias)·v`` for SAM's image-encoder
attention (reference image_encoder.py:224-240) in one kernel, with the
decomposed relative-position bias assembled **inside** the kernel from the
small per-axis tables — the (N, N) bias tensor never exists in HBM.

Shapes: q, k, v (G, N, D) where G = batch·windows·heads and N = Kh·Kw is the
token grid (196 for 14×14 windows, 4096 for the global layers).
rel_h (G, N, Kh) and rel_w (G, N, Kw) are the q-projected tables
(two cheap einsums, done outside).

Design notes (pallas_guide.md):
* grid = (G, N/q_block); each program holds its q block + the full k/v rows
  in VMEM (4096·128·4B ≈ 2 MB each — fits), so no flash accumulation state
  is needed; logits tile is (q_block, N) fp32.
* bias tile build: flattened key index k = kh·Kw + kw ⇒
  repeat(rel_h, Kw) + tile(rel_w, Kh) — pure lane-parallel VPU ops.
* matmuls declare ``preferred_element_type=float32`` (MXU accumulate), softmax
  runs fp32, the output returns in the input dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                 scale: float, kh: int, kw: int, g_block: int):
    n = kh * kw
    # one-hot expansion matrices for the decomposed bias (Mosaic has no
    # lane-repeat reshape):
    #   rh_full[q, k] = rh[q, k // Kw]  via E_h[i, k] = (k // Kw == i)
    #   rw_full[q, k] = rw[q, k %  Kw]  via E_w[j, k] = (k %  Kw == j)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    eh = (col // kw == jax.lax.broadcasted_iota(jnp.int32, (kh, n), 0)
          ).astype(jnp.float32)
    ew = (col % kw == jax.lax.broadcasted_iota(jnp.int32, (kw, n), 0)
          ).astype(jnp.float32)

    # unrolled loop over the window-head groups of this program: amortises
    # per-program setup over g_block small attention problems
    for g in range(g_block):
        q = q_ref[g]            # (qb, D)
        k = k_ref[g]            # (N, D)
        v = v_ref[g]            # (N, D)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (qb, N)

        rh = rh_ref[g].astype(jnp.float32)                   # (qb, Kh)
        rw = rw_ref[g].astype(jnp.float32)                   # (qb, Kw)
        bias = jax.lax.dot_general(rh, eh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        bias = bias + jax.lax.dot_general(rw, ew, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        logits = logits + bias

        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

        out = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = out.astype(o_ref.dtype)


def _attn_kernel_cat(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                     scale: float, kh: int, kw: int, g_block: int):
    """Single-matmul logits variant: ``[q, rh/s, rw/s] @ [k, EhT, EwT]ᵀ · s``
    computes q·kᵀ·s + rh·Eh + rw·Ew in ONE contraction of width D+Kh+Kw —
    for D=80, Kh=Kw=14 that still fits one 128-wide MXU K-tile, so the two
    bias matmuls come for free and the kernel issues half the small matmuls
    of :func:`_attn_kernel`."""
    n = kh * kw
    # (N, Kh/Kw) transposed one-hot expansions, built on the VPU
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 0)
    ehT = (row // kw == jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1))
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kw), 0)
    ewT = (row % kw == jax.lax.broadcasted_iota(jnp.int32, (n, kw), 1))

    inv = 1.0 / scale
    for g in range(g_block):
        q = q_ref[g]            # (qb, D)
        k = k_ref[g]            # (N, D)
        v = v_ref[g]            # (N, D)
        dt = q.dtype
        qcat = jnp.concatenate(
            [q, (rh_ref[g].astype(jnp.float32) * inv).astype(dt),
             (rw_ref[g].astype(jnp.float32) * inv).astype(dt)], axis=1)
        kcat = jnp.concatenate([k, ehT.astype(dt), ewT.astype(dt)], axis=1)
        logits = jax.lax.dot_general(
            qcat, kcat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (qb, N)

        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

        out = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = out.astype(o_ref.dtype)


def _attn_kernel_phased(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                        scale: float, kh: int, kw: int, g_block: int):
    """Phase-batched variant: one BATCHED dot_general per phase over the whole
    g_block (qk+bias, then softmax, then av), so the MXU runs the small
    matmuls back-to-back instead of stalling on the softmax of each group
    (the serial qk->softmax->av chain of the per-group loop)."""
    n = kh * kw
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 0)
    ehT = (row // kw == jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1))
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kw), 0)
    ewT = (row % kw == jax.lax.broadcasted_iota(jnp.int32, (n, kw), 1))

    q = q_ref[:]                    # (g, qb, D)
    k = k_ref[:]                    # (g, N, D)
    v = v_ref[:]
    dt = q.dtype
    inv = 1.0 / scale
    qcat = jnp.concatenate(
        [q, (rh_ref[:].astype(jnp.float32) * inv).astype(dt),
         (rw_ref[:].astype(jnp.float32) * inv).astype(dt)], axis=2)
    ecat = jnp.broadcast_to(
        jnp.concatenate([ehT.astype(dt), ewT.astype(dt)], axis=1)[None],
        (q.shape[0], n, kh + kw))
    kcat = jnp.concatenate([k, ecat], axis=2)
    logits = jax.lax.dot_general(
        qcat, kcat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale        # (g, qb, N)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(dt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("kh", "kw", "q_block", "g_block",
                                   "cat_bias", "interpret"))
def fused_rel_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        rel_h: jnp.ndarray, rel_w: jnp.ndarray, *,
                        kh: int, kw: int, q_block: Optional[int] = None,
                        g_block: Optional[int] = None,
                        cat_bias: str = "phased",
                        interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (G, N, D); rel_h: (G, N, kh); rel_w: (G, N, kw) -> (G, N, D)."""
    g, n, d = q.shape
    assert n == kh * kw, f"N={n} must equal kh*kw={kh * kw}"
    scale = d ** -0.5
    if q_block is None:
        q_block = n if n <= 1024 else 1024
    assert n % q_block == 0
    if g_block is None:
        # small windows: batch several groups per program to amortise the
        # per-program setup (v5e sweep, phased kernel: 25 > 16 > 50 > 8);
        # big (global) problems: g_block 2 at q_block 1024 won the sweep
        g_block = 25 if n <= 1024 else 2
    while g % g_block:
        g_block -= 1

    grid = (g // g_block, n // q_block)
    body = {"loop": _attn_kernel, "cat": _attn_kernel_cat,
            "phased": _attn_kernel_phased}[
        cat_bias if isinstance(cat_bias, str) else
        ("cat" if cat_bias else "loop")]
    kernel = partial(body, scale=scale, kh=kh, kw=kw, g_block=g_block)
    flops = 2 * g * n * n * d * 2 + 4 * g * n * n
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_block, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((g_block, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((g_block, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((g_block, q_block, kh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((g_block, q_block, kw), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((g_block, q_block, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=g * n * n,
            bytes_accessed=4 * g * n * d * q.dtype.itemsize),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


# ---------------------------------------------------------------------------
# v3: head-major windowed attention — consumes the UN-transposed qkv.
#
# The encoder trace showed ~16 ms/img going into the (b, n, 3, heads, hd)
# head-split transpose + the qkv[0/1/2] slices + squeezes around the v1
# kernel.  Here the qkv projection writes columns grouped per head
# ([q_h | k_h | v_h] padded to a 128-multiple), so the kernel BlockSpec
# slices one head's activations directly off the matmul output and no
# reordering ever touches HBM.  The output stays head-major
# (heads, wb, n, hd); the output projection contracts (head, hd) jointly via
# one dot_general, which XLA folds into a single (T, heads*hd) matmul.
# ---------------------------------------------------------------------------


def _headmajor_pad(hd: int) -> int:
    return ((3 * hd + 127) // 128) * 128


def prepare_qkv_headmajor(p_attn: dict, num_heads: int, dtype):
    """Permute + pad the qkv weight columns into per-head groups.

    (E, 3E) with columns ordered (3, heads, hd) -> (E, heads*P) ordered
    (heads, [q|k|v] + zero pad), P = 3*hd rounded up to 128."""
    w = p_attn["qkv"]["w"]
    e = w.shape[0]
    hd = e // num_heads
    pad = _headmajor_pad(hd)
    w = w.reshape(e, 3, num_heads, hd)
    w = jnp.transpose(w, (0, 2, 1, 3)).reshape(e, num_heads, 3 * hd)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, pad - 3 * hd)))
    b = p_attn["qkv"].get("b")
    if b is None:
        b = jnp.zeros((3 * e,), jnp.float32)
    b = jnp.transpose(b.reshape(3, num_heads, hd), (1, 0, 2)).reshape(
        num_heads, 3 * hd)
    b = jnp.pad(b, ((0, 0), (0, pad - 3 * hd)))
    return w.reshape(e, num_heads * pad).astype(dtype), b.reshape(-1)


def _attn_kernel_headmajor(qkv_ref, rh_ref, rw_ref, o_ref, *,
                           scale: float, kh: int, kw: int, hd: int):
    n = kh * kw
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 0)
    ehT = (row // kw == jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1))
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kw), 0)
    ewT = (row % kw == jax.lax.broadcasted_iota(jnp.int32, (n, kw), 1))

    qkv = qkv_ref[:]                 # (g, n, P) — one head's columns
    q = qkv[:, :, :hd]
    k = qkv[:, :, hd:2 * hd]
    v = qkv[:, :, 2 * hd:3 * hd]
    dt = qkv.dtype
    inv = 1.0 / scale
    qcat = jnp.concatenate(
        [q, (rh_ref[0].astype(jnp.float32) * inv).astype(dt),
         (rw_ref[0].astype(jnp.float32) * inv).astype(dt)], axis=2)
    ecat = jnp.broadcast_to(
        jnp.concatenate([ehT.astype(dt), ewT.astype(dt)], axis=1)[None],
        (q.shape[0], n, kh + kw))
    kcat = jnp.concatenate([k, ecat], axis=2)
    logits = jax.lax.dot_general(
        qcat, kcat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # (g, n, n)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(dt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("kh", "kw", "heads", "hd", "g_block",
                                   "interpret"))
def fused_rel_attention_headmajor(qkv: jnp.ndarray, rel_h: jnp.ndarray,
                                  rel_w: jnp.ndarray, *, kh: int, kw: int,
                                  heads: int, hd: int,
                                  g_block: Optional[int] = None,
                                  interpret: bool = False) -> jnp.ndarray:
    """qkv: (Wb, N, heads*P) head-grouped projections (prepare_qkv_headmajor);
    rel_h: (heads, Wb, N, kh); rel_w: (heads, Wb, N, kw)
    -> (heads, Wb, N, hd) attention output (pre output-projection)."""
    wb, n, hp = qkv.shape
    assert n == kh * kw
    p = hp // heads
    assert p == _headmajor_pad(hd), (p, hd)
    scale = hd ** -0.5
    if g_block is None:
        g_block = 25
    while wb % g_block:
        g_block -= 1
    grid = (wb // g_block, heads)
    kernel = partial(_attn_kernel_headmajor, scale=scale, kh=kh, kw=kw, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_block, n, p), lambda i, h: (i, 0, h)),
            pl.BlockSpec((1, g_block, n, kh), lambda i, h: (h, i, 0, 0)),
            pl.BlockSpec((1, g_block, n, kw), lambda i, h: (h, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g_block, n, hd), lambda i, h: (h, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((heads, wb, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * wb * heads * n * n * (hd + kh + kw) * 2,
            transcendentals=wb * heads * n * n,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize),
        interpret=interpret,
    )(qkv, rel_h, rel_w)


def _attn_kernel_headmajor_qb(qq_ref, kv_ref, rh_ref, rw_ref, o_ref, *,
                              scale: float, kh: int, kw: int, hd: int):
    """q-blocked head-major body (global layers: N too big for one block)."""
    n = kh * kw
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 0)
    ehT = (row // kw == jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1))
    row = jax.lax.broadcasted_iota(jnp.int32, (n, kw), 0)
    ewT = (row % kw == jax.lax.broadcasted_iota(jnp.int32, (n, kw), 1))

    q = qq_ref[0][:, :hd]                       # (qb, hd)
    kv = kv_ref[0]                              # (n, P)
    k = kv[:, hd:2 * hd]
    v = kv[:, 2 * hd:3 * hd]
    dt = q.dtype
    inv = 1.0 / scale
    qcat = jnp.concatenate(
        [q, (rh_ref[0, 0].astype(jnp.float32) * inv).astype(dt),
         (rw_ref[0, 0].astype(jnp.float32) * inv).astype(dt)], axis=1)
    kcat = jnp.concatenate([k, ehT.astype(dt), ewT.astype(dt)], axis=1)
    logits = jax.lax.dot_general(
        qcat, kcat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (qb, n)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(dt), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("kh", "kw", "heads", "hd", "q_block",
                                   "interpret"))
def fused_rel_attention_headmajor_global(qkv: jnp.ndarray, rel_h: jnp.ndarray,
                                         rel_w: jnp.ndarray, *, kh: int,
                                         kw: int, heads: int, hd: int,
                                         q_block: int = 1024,
                                         interpret: bool = False) -> jnp.ndarray:
    """Global-layer analogue of :func:`fused_rel_attention_headmajor`.

    qkv: (B, N, heads*P); rel_h: (heads, B, N, kh); rel_w: (heads, B, N, kw)
    -> (heads, B, N, hd).  The q axis is blocked (logits tile q_block x N in
    fp32 VMEM); k/v rows ride along as the full-N block of the same array."""
    b, n, hp = qkv.shape
    assert n == kh * kw
    p = hp // heads
    assert p == _headmajor_pad(hd), (p, hd)
    scale = hd ** -0.5
    q_block = min(q_block, n)
    while n % q_block:  # shrink until it divides — a truncating grid would
        q_block //= 2   # leave the token tail unwritten (garbage output)
    grid = (b, n // q_block, heads)
    kernel = partial(_attn_kernel_headmajor_qb, scale=scale, kh=kh, kw=kw,
                     hd=hd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, p), lambda i, j, h: (i, j, h)),
            pl.BlockSpec((1, n, p), lambda i, j, h: (i, 0, h)),
            pl.BlockSpec((1, 1, q_block, kh), lambda i, j, h: (h, i, j, 0)),
            pl.BlockSpec((1, 1, q_block, kw), lambda i, j, h: (h, i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, hd),
                               lambda i, j, h: (h, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((heads, b, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * heads * n * n * (hd + kh + kw) * 2,
            transcendentals=b * heads * n * n,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize),
        interpret=interpret,
    )(qkv, qkv, rel_h, rel_w)


# ---------------------------------------------------------------------------
# v4: 3-D windowed attention with IN-KERNEL rel-pos projection.
#
# Round-3 traces showed the v3 path paying ~13 ms/img in pure HBM layout work
# around the kernel: the (T, heads·P) -> (Wb, 196, heads·P) reshape is a full
# copy (196 rows break the (8, 128) tile grid, so the 3-D form is physically
# padded), and the out-of-kernel rel projection materialises
# (heads, Wb, N, 14) fp32 tensors whose 14-lane minor pads 9x in HBM.  Fix:
# * windows carry ``np = ceil(ws²/8)·8`` tokens (200 for ws=14) so the 2-D
#   and 3-D views share one layout — every outside reshape is free; the
#   np - n dead key slots are masked with -1e30 logits in-kernel;
# * the rel-pos projection g = q·T runs in-kernel on the VMEM-resident q
#   (tables are (hd, 2ws-1) — tiny), and the per-query-row table select
#   rel[row, j] = g[row, p(row) + j] becomes ``ws`` static masked lane-rolls
#   (the row's window-row p selects a CONTIGUOUS lane slice; the k-index
#   flip j -> ws-1-j is absorbed into the one-hot expansion columns).
# Nothing rel-pos-shaped ever touches HBM.
# ---------------------------------------------------------------------------


def _attn_kernel_window3d(qkv_ref, tcat_ref, o_ref, *, scale: float, ws: int,
                          np_: int, hd: int):
    n = ws * ws
    inv = 1.0 / scale

    qkv = qkv_ref[:]                   # (g, np, P) one head's columns
    q = qkv[:, :, :hd]
    k = qkv[:, :, hd:2 * hd]
    v = qkv[:, :, 2 * hd:3 * hd]
    dt = qkv.dtype
    g = q.shape[0]

    # g[row, r] = q[row] · table[r]; h-table rows live in lanes [0, 2ws-1),
    # w-table rows in [128, 128 + 2ws-1) — both slice lane-aligned after roll
    gcat = jax.lax.dot_general(q, tcat_ref[:], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    # rel_rev[row, j] = g[row, base(row) + j] where base is the query's
    # window-row (h part) / window-col (w part).  Per-row variable lane shift
    # via LOG-STEP conditional rolls: ceil(log2 ws) rolls per zone instead of
    # ws masked rolls (VPU work is the kernel's only non-MXU cost).  fp32 —
    # Mosaic's lane rotate only supports 32-bit elements.
    gs = gcat * inv
    row = jax.lax.broadcasted_iota(jnp.int32, (1, np_, 1), 1)
    p_of = jnp.minimum(row // ws, ws - 1)       # dead rows: clamp, masked later
    q_of = row % ws
    gh = gs[:, :, :128]                          # 128-aligned free slices
    gw = gs[:, :, 128:]
    b = 1
    while b < ws:
        gh = jnp.where((p_of & b) != 0, pltpu.roll(gh, shift=128 - b, axis=2),
                       gh)
        gw = jnp.where((q_of & b) != 0, pltpu.roll(gw, shift=128 - b, axis=2),
                       gw)
        b <<= 1
    relh = gh[:, :, :ws].astype(dt)
    relw = gw[:, :, :ws].astype(dt)

    # lane j of rel_rev corresponds to k-coordinate ws-1-j (see header)
    key = jax.lax.broadcasted_iota(jnp.int32, (np_, ws), 0)
    ehT = (key // ws == ws - 1 - jax.lax.broadcasted_iota(
        jnp.int32, (np_, ws), 1))
    ewT = (key % ws == ws - 1 - jax.lax.broadcasted_iota(
        jnp.int32, (np_, ws), 1))
    ewT = jnp.logical_and(ewT, key < n)          # dead slots expand to 0

    qcat = jnp.concatenate([q, relh, relw], axis=2)
    ecat = jnp.broadcast_to(
        jnp.concatenate([ehT.astype(dt), ewT.astype(dt)], axis=1)[None],
        (g, np_, 2 * ws))
    kcat = jnp.concatenate([k, ecat], axis=2)
    logits = jax.lax.dot_general(
        qcat, kcat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # (g, np, np)

    if np_ != n:                                  # dead keys: -inf logits
        dead = jax.lax.broadcasted_iota(jnp.int32, (1, 1, np_), 2) >= n
        logits = logits + jnp.where(dead, -1e30, 0.0)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(dt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("ws", "heads", "hd", "g_block",
                                   "interpret"))
def fused_rel_attention_window3d(qkv: jnp.ndarray, tcat: jnp.ndarray, *,
                                 ws: int, heads: int, hd: int,
                                 g_block: Optional[int] = None,
                                 interpret: bool = False) -> jnp.ndarray:
    """qkv: (Wb, np, heads·P) head-grouped projections over np = ceil(ws²/8)·8
    padded window tokens; tcat: (hd, 256) rel tables (h rows at lanes
    [0, 2ws-1), w rows at [128, 128+2ws-1)) -> (heads, Wb, np, hd)."""
    wb, np_, hp = qkv.shape
    n = ws * ws
    assert np_ == -(-n // 8) * 8, (np_, ws)
    p = hp // heads
    assert p == _headmajor_pad(hd), (p, hd)
    assert tcat.shape == (hd, 256) and 2 * (2 * ws - 1) <= 256
    scale = hd ** -0.5
    if g_block is None:
        g_block = 25
    while wb % g_block:
        g_block -= 1
    grid = (wb // g_block, heads)
    kernel = partial(_attn_kernel_window3d, scale=scale, ws=ws, np_=np_,
                     hd=hd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_block, np_, p), lambda i, h: (i, 0, h)),
            pl.BlockSpec((hd, 256), lambda i, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g_block, np_, hd),
                               lambda i, h: (h, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((heads, wb, np_, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * wb * heads * np_ * (hd * 256 + np_ * (hd + 2 * ws)
                                          + np_ * hd),
            transcendentals=wb * heads * np_ * np_,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize),
        interpret=interpret,
    )(qkv, tcat)


def _attn_kernel_global3d(qq_ref, kv_ref, tcat_ref, o_ref, *,
                          scale: float, kh: int, kw: int, hd: int,
                          q_block: int, int8_qk: bool = False,
                          int8_pv: bool = False):
    """Global-layer q-blocked body with IN-KERNEL rel-pos (window3d design;
    the q-block's token offset comes from the grid position).

    ``int8_qk``: dynamically quantize q/k in-kernel and run the q·kᵀ dot on
    the int8 MXU (2× rate on v5e+).  k is quantized per CHANNEL with the
    channel scale FOLDED INTO q before q's per-row quantization — every
    scale application then broadcasts along lanes (a per-k-row scale would
    need a sublane→lane transpose of a length-N vector, which Mosaic
    relayouts through HBM).  The rel-pos bias becomes a separate small bf16
    dot against the exact 0/1 selector columns.  Serving mode only —
    accuracy is gated end-to-end with the rest of the int8 path
    (tests/test_quantize.py)."""
    n = kh * kw
    inv = 1.0 / scale

    q = qq_ref[0][:, :hd]                       # (qb, hd)
    kv = kv_ref[0]                              # (n, P)
    k = kv[:, hd:2 * hd]
    v = kv[:, 2 * hd:3 * hd]
    dt = q.dtype

    gcat = jax.lax.dot_general(q, tcat_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    gs = gcat * inv
    tok = (pl.program_id(1) * q_block
           + jax.lax.broadcasted_iota(jnp.int32, (q_block, 1), 0))
    p_of = tok // kw
    q_of = tok % kw
    gh = gs[:, :128]
    gw = gs[:, 128:]
    b = 1
    while b < max(kh, kw):
        if b < kh:
            gh = jnp.where((p_of & b) != 0,
                           pltpu.roll(gh, shift=128 - b, axis=1), gh)
        if b < kw:
            gw = jnp.where((q_of & b) != 0,
                           pltpu.roll(gw, shift=128 - b, axis=1), gw)
        b <<= 1
    relh = gh[:, :kh].astype(dt)
    relw = gw[:, :kw].astype(dt)

    key = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 0)
    ehT = (key // kw == kh - 1 - jax.lax.broadcasted_iota(
        jnp.int32, (n, kh), 1))
    key = jax.lax.broadcasted_iota(jnp.int32, (n, kw), 0)
    ewT = (key % kw == kw - 1 - jax.lax.broadcasted_iota(
        jnp.int32, (n, kw), 1))

    if int8_qk:
        kf = k.astype(jnp.float32)
        sk_c = jnp.max(jnp.abs(kf), axis=0, keepdims=True) / 127.0 + 1e-12
        ki = jnp.round(kf / sk_c).astype(jnp.int8)           # (n, hd)
        qs = q.astype(jnp.float32) * sk_c                    # fold k scales
        sq_r = jnp.max(jnp.abs(qs), axis=1, keepdims=True) / 127.0 + 1e-12
        qi = jnp.round(qs / sq_r).astype(jnp.int8)           # (qb, hd)
        acc = jax.lax.dot_general(
            qi, ki, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                # (qb, n)
        bias = jax.lax.dot_general(
            jnp.concatenate([relh, relw], axis=1),
            jnp.concatenate([ehT.astype(dt), ewT.astype(dt)], axis=1),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = (acc.astype(jnp.float32) * sq_r + bias) * scale
    else:
        qcat = jnp.concatenate([q, relh, relw], axis=1)
        kcat = jnp.concatenate([k, ehT.astype(dt), ewT.astype(dt)], axis=1)
        logits = jax.lax.dot_general(
            qcat, kcat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (qb, n)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    if int8_pv:
        # MEASURED NEGATIVE (tools/bench_int8pv.py; BENCHMARKS.md round 5):
        # 0.98x vs int8_qk at both global and window shapes, and the fixed
        # scale 127 that keeps the dequant lane-friendly flushes the
        # near-uniform ~1/n global-attention probabilities to zero (rel-err
        # 0.42 at n=4096).  Kept opt-in for the reproducible A/B; never a
        # serving default.
        vf = v.astype(jnp.float32)
        sv_c = jnp.max(jnp.abs(vf), axis=0, keepdims=True) / 127.0 + 1e-12
        vi = jnp.round(vf / sv_c).astype(jnp.int8)           # (n, hd)
        pi = jnp.round(probs * 127.0).astype(jnp.int8)       # (qb, n)
        acc = jax.lax.dot_general(
            pi, vi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                # (qb, hd)
        out = acc.astype(jnp.float32) * (sv_c / 127.0)
    else:
        out = jax.lax.dot_general(
            probs.astype(dt), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("kh", "kw", "heads", "hd", "q_block",
                                   "int8_qk", "int8_pv", "interpret"))
def fused_rel_attention_global3d(qkv: jnp.ndarray, tcat: jnp.ndarray, *,
                                 kh: int, kw: int, heads: int, hd: int,
                                 q_block: int = 1024, int8_qk: bool = False,
                                 int8_pv: bool = False,
                                 interpret: bool = False) -> jnp.ndarray:
    """Global-layer analogue of :func:`fused_rel_attention_window3d` —
    qkv: (B, N, heads·P); tcat: (hd, 256) packed rel tables (kh rows must be
    ≤ 65 so 2·kh-1 ≤ 128+1... h zone holds 2·kh-1 ≤ 128 rows, w zone 2·kw-1)
    -> (heads, B, N, hd)."""
    b, n, hp = qkv.shape
    assert n == kh * kw and 2 * max(kh, kw) - 1 <= 128
    p = hp // heads
    assert p == _headmajor_pad(hd), (p, hd)
    scale = hd ** -0.5
    q_block = min(q_block, n)
    while n % q_block:  # shrink until it divides — a truncating grid would
        q_block //= 2   # leave the token tail unwritten (garbage output)
    grid = (b, n // q_block, heads)
    kernel = partial(_attn_kernel_global3d, scale=scale, kh=kh, kw=kw, hd=hd,
                     q_block=q_block, int8_qk=int8_qk, int8_pv=int8_pv)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, p), lambda i, j, h: (i, j, h)),
            pl.BlockSpec((1, n, p), lambda i, j, h: (i, 0, h)),
            pl.BlockSpec((hd, 256), lambda i, j, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, hd),
                               lambda i, j, h: (h, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((heads, b, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * heads * n * n * (hd + kh + kw) * 2,
            transcendentals=b * heads * n * n,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize),
        interpret=interpret,
    )(qkv, qkv, tcat)


def _attn_kernel_window_rect(qkv_ref, tcat_ref, bkv_ref, sel_ref, dead_ref,
                             o_ref, *, scale: float, ws: int, rh: int,
                             rw: int, np_: int, hd: int):
    """Edge/corner window body for the COMPACT window layout: queries are
    only the rh×rw REAL tokens of a ws×ws window whose remaining positions
    are reference zero-pad.  Pad tokens' k/v are closed-form — all equal to
    the qkv projection biases b_k/b_v (pad inputs are re-zeroed after LN
    every layer, image_encoder._block_apply_windowed) — so the kernel
    SYNTHESIZES the pad key rows in VMEM (one broadcast of b_k/b_v) instead
    of carrying them through LN/qkv/MLP, and their rel-pos biases come from
    the same one-hot selector columns as real keys (the selectors are baked
    static constants carrying each key row's grid coordinates).  Bit-level
    this is the same dot/softmax structure as materializing the pads, just
    with keys reordered (real rect first, pad rows appended)."""
    n = rh * rw
    n_all = ws * ws
    nk = np_ + (-(-(n_all - n) // 8) * 8)        # real slots + aligned pads
    inv = 1.0 / scale

    qkv = qkv_ref[:]                   # (g, np, P) one head's columns
    q = qkv[:, :, :hd]
    k = qkv[:, :, hd:2 * hd]
    v = qkv[:, :, 2 * hd:3 * hd]
    bk = bkv_ref[0, :, hd:2 * hd]                            # (1, hd)
    bv = bkv_ref[0, :, 2 * hd:3 * hd]
    dt = qkv.dtype
    g = q.shape[0]

    gcat = jax.lax.dot_general(q, tcat_ref[:], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    gs = gcat * inv
    row = jax.lax.broadcasted_iota(jnp.int32, (1, np_, 1), 1)
    p_of = jnp.minimum(row // rw, rh - 1)       # dead rows: clamp, masked later
    q_of = row % rw
    gh = gs[:, :, :128]
    gw = gs[:, :, 128:]
    b = 1
    while b < ws:
        gh = jnp.where((p_of & b) != 0, pltpu.roll(gh, shift=128 - b, axis=2),
                       gh)
        gw = jnp.where((q_of & b) != 0, pltpu.roll(gw, shift=128 - b, axis=2),
                       gw)
        b <<= 1
    relh = gh[:, :, :ws].astype(dt)
    relw = gw[:, :, :ws].astype(dt)

    # Pad-key k/v rows are all b_k/b_v, so their logits split into
    # q·b_k (one VPU reduction per query, shared by every pad key) plus the
    # rel-pos selector dot, and their output contribution is (Σ_pad p)·b_v.
    # Everything stays in LANE-dim concats/slices — Mosaic cannot concat or
    # pad on sublanes when operands carry different lane offsets (the k/v
    # column slices do).
    qcat = jnp.concatenate([q, relh, relw], axis=2)
    kcat = jnp.concatenate(
        [k, jnp.broadcast_to(sel_ref[:np_][None], (g, np_, 2 * ws))], axis=2)
    logits_real = jax.lax.dot_general(
        qcat, kcat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (g, np, np)
    if nk > np_:  # static: degenerate rh=rw=ws windows have no pad keys
        qrel = jnp.concatenate([relh, relw], axis=2)
        sel_pad = jnp.broadcast_to(sel_ref[np_:][None],
                                   (g, nk - np_, 2 * ws))
        qbk = jnp.sum(q.astype(jnp.float32) * bk.astype(jnp.float32)[None],
                      axis=2, keepdims=True)                 # (g, np, 1)
        logits_pad = jax.lax.dot_general(
            qrel, sel_pad, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) + qbk        # (g, np, npad)
        logits = jnp.concatenate([logits_real, logits_pad], axis=2)
    else:
        logits = logits_real
    logits = logits * scale + dead_ref[0:1][None]            # -1e30 dead cols

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs[:, :, :np_].astype(dt), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if nk > np_:
        s_pad = jnp.sum(probs[:, :, np_:], axis=2, keepdims=True)
        out = out + s_pad * bv.astype(jnp.float32)[None]
    o_ref[0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("ws", "rh", "rw", "heads", "hd", "g_block",
                                   "interpret"))
def fused_rel_attention_window_rect(qkv: jnp.ndarray, tcat: jnp.ndarray,
                                    bkv: jnp.ndarray, *, ws: int, rh: int,
                                    rw: int, heads: int, hd: int,
                                    g_block: Optional[int] = None,
                                    interpret: bool = False) -> jnp.ndarray:
    """Compact edge/corner window attention (see :func:`_attn_kernel_window_rect`).

    qkv: (Wb, np, heads·P) over np = ceil(rh·rw/8)·8 REAL window tokens;
    tcat: (hd, 256) rel tables for the FULL ws-grid; bkv: (heads, P) packed
    per-head qkv projection bias (the pad tokens' k/v) -> (heads, Wb, np, hd)."""
    wb, np_, hp = qkv.shape
    n = rh * rw
    assert np_ >= n and np_ % 8 == 0 and rh <= ws and rw <= ws, \
        (np_, rh, rw, ws)
    p = hp // heads
    assert p == _headmajor_pad(hd), (p, hd)
    assert tcat.shape == (hd, 256) and 2 * (2 * ws - 1) <= 256
    assert bkv.shape == (heads, p), (bkv.shape, heads, p)
    scale = hd ** -0.5
    if g_block is None:
        g_block = min(wb, 25)
    while wb % g_block:
        g_block -= 1
    grid = (wb // g_block, heads)
    nk = np_ + (-(-(ws * ws - n) // 8) * 8)

    # static per-key grid coordinates: real rect rows first (kk -> (kk//rw,
    # kk%rw)), then the pad region row-major; -1 marks dead alignment slots.
    # Baked into operands (Pallas kernels may not capture array constants).
    coords = np.full((nk,), -1, np.int64)
    real = np.arange(n)
    coords[:n] = (real // rw) * ws + real % rw
    pad_pos = [(pp, qq) for pp in range(ws) for qq in range(ws)
               if not (pp < rh and qq < rw)]
    coords[np_:np_ + len(pad_pos)] = [pp * ws + qq for pp, qq in pad_pos]
    ehT = np.zeros((nk, ws), np.float32)
    ewT = np.zeros((nk, ws), np.float32)
    valid = coords >= 0
    # lane j of the rolled rel zones ↔ key coordinate ws-1-j (window3d)
    ehT[valid, ws - 1 - coords[valid] // ws] = 1.0
    ewT[valid, ws - 1 - coords[valid] % ws] = 1.0
    sel = jnp.asarray(np.concatenate([ehT, ewT], axis=1), qkv.dtype)
    dead = jnp.asarray(np.where(valid, 0.0, -1e30)[None, :], jnp.float32)

    kernel = partial(_attn_kernel_window_rect, scale=scale, ws=ws, rh=rh,
                     rw=rw, np_=np_, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_block, np_, p), lambda i, h: (i, 0, h)),
            pl.BlockSpec((hd, 256), lambda i, h: (0, 0)),
            # (heads, 1, P) so the block's last two dims equal the array's
            # (Mosaic's (8, 128) tiling rule forbids a (1, P) sublane slice)
            pl.BlockSpec((1, 1, p), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((nk, 2 * ws), lambda i, h: (0, 0)),
            pl.BlockSpec((1, nk), lambda i, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g_block, np_, hd),
                               lambda i, h: (h, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((heads, wb, np_, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * wb * heads * np_ * (hd * 256 + nk * (hd + 2 * ws)
                                          + nk * hd),
            transcendentals=wb * heads * np_ * nk,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize),
        interpret=interpret,
    )(qkv, tcat, bkv.reshape(heads, 1, p), sel, dead)


def prepare_rel_tables_window3d(p_attn: dict, ws: int, dtype,
                                ws_w: int | None = None) -> jnp.ndarray:
    """(hd, 256) packed rel-pos tables for the window3d kernel: tcat[c, r] =
    rel_pos_h[r, c] for r < 2ws-1, tcat[c, 128+r] = rel_pos_w[r, c].

    ``ws_w``: key-grid width when it differs from the height ``ws`` (global
    layers on non-square token grids); each table is resized to its OWN
    axis length 2*size-1."""
    from samcarriestheburden_tpu.models.image_encoder import \
        resize_rel_pos_table

    if ws_w is None:
        ws_w = ws
    rh_max, rw_max = 2 * ws - 1, 2 * ws_w - 1
    th = resize_rel_pos_table(p_attn["rel_pos_h"], rh_max).T  # (hd, R)
    tw = resize_rel_pos_table(p_attn["rel_pos_w"], rw_max).T
    hd = th.shape[0]
    tcat = jnp.zeros((hd, 256), jnp.float32)
    tcat = tcat.at[:, :rh_max].set(th)
    tcat = tcat.at[:, 128:128 + rw_max].set(tw)
    return tcat.astype(dtype)


def attention_apply_pallas(p: dict, x: jnp.ndarray, num_heads: int,
                           use_rel_pos: bool, *, interpret: bool = False,
                           qkv_pre: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Drop-in replacement for models.image_encoder.attention_apply backed by
    the fused kernel.  x: (B, H, W, C) -> (B, H, W, C).

    ``qkv_pre``: optionally the already-projected (B·N, 3C) qkv activations
    (from the fused LN+mask+linear kernel, kernels/mlp.py) — then ``x`` is
    only consulted for its shape and ``use_rel_pos`` must hold."""
    from samcarriestheburden_tpu.models.common import linear
    from samcarriestheburden_tpu.models.image_encoder import (
        _rel_pos_indices, resize_rel_pos_table)

    b, h, w, c = x.shape
    hd = c // num_heads
    n = h * w

    assert qkv_pre is None or use_rel_pos
    qkv = linear(p["qkv"], x) if qkv_pre is None else qkv_pre
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(3, b * num_heads, n, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    if not use_rel_pos:
        # plain attention path (not used by SAM configs; fall back to XLA)
        from samcarriestheburden_tpu.models.image_encoder import attention_apply

        return attention_apply(p, x, num_heads, use_rel_pos)

    rh_table = resize_rel_pos_table(p["rel_pos_h"], 2 * h - 1)[_rel_pos_indices(h, h)]
    rw_table = resize_rel_pos_table(p["rel_pos_w"], 2 * w - 1)[_rel_pos_indices(w, w)]
    r_q = q.reshape(b * num_heads, h, w, hd)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh_table.astype(q.dtype),
                       preferred_element_type=jnp.float32).reshape(b * num_heads, n, h)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw_table.astype(q.dtype),
                       preferred_element_type=jnp.float32).reshape(b * num_heads, n, w)

    out = fused_rel_attention(q, k, v, rel_h.astype(q.dtype),
                              rel_w.astype(q.dtype), kh=h, kw=w,
                              interpret=interpret)
    out = out.reshape(b, num_heads, h, w, hd)
    out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, c)
    return linear(p["proj"], out)


# ---------------------------------------------------------------------------
# v2: fused windowed-block attention — LN'd tokens in, attention out.
# Per-head qkv projection, decomposed rel-pos bias, softmax, value matmul and
# the output projection all happen in-kernel, accumulated over the head grid
# axis.  Eliminates the (3, B·heads, N, D) head-split transpose, the
# attention-output transpose and the qkv/attn-out HBM round-trips that
# dominate the windowed blocks (measured ~400 MB HBM/block at ViT-H batch 4).
# ---------------------------------------------------------------------------


def _block_attn_kernel(xn_ref, wq_ref, wk_ref, wv_ref, bqkv_ref, wp_ref,
                       th_ref, tw_ref, o_ref, *,
                       scale: float, ws: int, g_block: int, heads: int):
    """Grid (Wb/g_block, heads); h is the accumulation (arbitrary) axis.

    xn:   (g_block, N, E)  pre-LayerNormed window tokens (N = ws²)
    wq/wk/wv: (1, E, D) head slices; bqkv: (1, 3, D); wp: (1, D, E)
    th/tw: (1, D, N)  expanded rel tables Texp[c, qh·ws + kh] = T[qh, kh, c]
    o:    (g_block, N, E)  Σ_h attnout_h · Wp_h   (accumulated in o.dtype)
    """
    h = pl.program_id(1)
    n = ws * ws

    # static index masks (VPU iota compares)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    m_qh = (row // ws == col // ws).astype(jnp.float32)   # block-diag mask
    m_qw = (row % ws == col // ws).astype(jnp.float32)
    sh = (row % ws == col // ws).astype(jnp.float32)      # Sh[j,k]=1[j%ws==k//ws]
    sw = (row % ws == col % ws).astype(jnp.float32)       # Sw[j,k]=1[j%ws==k%ws]

    wq = wq_ref[0]
    wk = wk_ref[0]
    wv = wv_ref[0]
    wp = wp_ref[0]
    bq, bk, bv = bqkv_ref[0, 0], bqkv_ref[0, 1], bqkv_ref[0, 2]
    th = th_ref[0]
    tw = tw_ref[0]

    for g in range(g_block):
        xn = xn_ref[g]                                          # (N, E)
        q = (jax.lax.dot_general(xn, wq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + bq.astype(jnp.float32))
        k = (jax.lax.dot_general(xn, wk, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + bk.astype(jnp.float32))
        v = (jax.lax.dot_general(xn, wv, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + bv.astype(jnp.float32))

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale         # (N, N)

        # decomposed rel-pos bias, fully in-matmul form:
        #   P[n, j] = q·Texp;  bias = (P ⊙ rowmask) @ S
        ph = jax.lax.dot_general(q, th.astype(jnp.float32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pw = jax.lax.dot_general(q, tw.astype(jnp.float32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        logits = logits + jax.lax.dot_general(
            ph * m_qh, sh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = logits + jax.lax.dot_general(
            pw * m_qw, sw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

        out = jax.lax.dot_general(probs.astype(v.dtype), v.astype(xn.dtype),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        part = jax.lax.dot_general(out.astype(xn.dtype), wp,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        @pl.when(h == 0)
        def _():
            o_ref[g] = part.astype(o_ref.dtype)

        @pl.when(h > 0)
        def _():
            o_ref[g] = (o_ref[g].astype(jnp.float32) + part).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("ws", "heads", "g_block", "interpret"))
def fused_window_block_attention(xn: jnp.ndarray, wq, wk, wv, bqkv, wp,
                                 texp_h, texp_w, *, ws: int, heads: int,
                                 g_block: Optional[int] = None,
                                 interpret: bool = False) -> jnp.ndarray:
    """xn: (Wb, N, E) pre-normed window tokens -> (Wb, N, E) attention output
    (pre proj-bias, pre residual).

    wq/wk/wv: (heads, E, D); bqkv: (heads, 3, D); wp: (heads, D, E);
    texp_h/texp_w: (heads, D, N) broadcast copies not required — (1, D, N)
    per-layer tables are tiled to heads by the caller (cheap, static)."""
    wb, n, e = xn.shape
    d = wq.shape[-1]
    assert n == ws * ws
    scale = d ** -0.5
    if g_block is None:
        g_block = 10
    while wb % g_block:
        g_block -= 1
    grid = (wb // g_block, heads)
    kernel = partial(_block_attn_kernel, scale=scale, ws=ws,
                     g_block=g_block, heads=heads)
    flops = 2 * wb * n * e * d * heads * 4 + 2 * wb * n * n * d * heads * 2 \
        + 2 * wb * n * n * d * heads * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_block, n, e), lambda i, h: (i, 0, 0)),
            pl.BlockSpec((1, e, d), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, e, d), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, e, d), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, 3, d), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, d, e), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, d, n), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, d, n), lambda i, h: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g_block, n, e), lambda i, h: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xn.shape, xn.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=wb * n * n * heads,
            bytes_accessed=2 * xn.size * xn.dtype.itemsize
            + grid[0] * heads * (3 * e * d + d * e) * 2),
        interpret=interpret,
    )(xn, wq, wk, wv, bqkv, wp, texp_h, texp_w)


def prepare_block_attn_weights(p: dict, num_heads: int, ws: int,
                               dtype=jnp.bfloat16) -> dict:
    """Split a block's attention params into the per-head layout the fused
    window-block kernel consumes.  Pure reshapes + the static rel-table
    gather; do once per layer outside the image loop."""
    from samcarriestheburden_tpu.models.image_encoder import (
        _rel_pos_indices, resize_rel_pos_table)

    e = p["qkv"]["w"].shape[0]
    d = e // num_heads
    w = p["qkv"]["w"].reshape(e, 3, num_heads, d).astype(dtype)
    wq = jnp.transpose(w[:, 0], (1, 0, 2))                    # (heads, E, D)
    wk = jnp.transpose(w[:, 1], (1, 0, 2))
    wv = jnp.transpose(w[:, 2], (1, 0, 2))
    b = p["qkv"]["b"].reshape(3, num_heads, d) if "b" in p["qkv"] \
        else jnp.zeros((3, num_heads, d))
    bqkv = jnp.transpose(b, (1, 0, 2)).astype(dtype)          # (heads, 3, D)
    wp = p["proj"]["w"].reshape(num_heads, d, e).astype(dtype)  # (heads, D, E)

    th = resize_rel_pos_table(p["rel_pos_h"], 2 * ws - 1)[_rel_pos_indices(ws, ws)]
    tw = resize_rel_pos_table(p["rel_pos_w"], 2 * ws - 1)[_rel_pos_indices(ws, ws)]
    # Texp[c, qh·ws + kh] = T[qh, kh, c]; tiled to heads for uniform blocking
    texp_h = jnp.tile(jnp.transpose(th, (2, 0, 1)).reshape(1, d, ws * ws),
                      (num_heads, 1, 1)).astype(dtype)
    texp_w = jnp.tile(jnp.transpose(tw, (2, 0, 1)).reshape(1, d, ws * ws),
                      (num_heads, 1, 1)).astype(dtype)
    return {"wq": wq, "wk": wk, "wv": wv, "bqkv": bqkv, "wp": wp,
            "texp_h": texp_h, "texp_w": texp_w,
            "proj_b": p["proj"].get("b")}
