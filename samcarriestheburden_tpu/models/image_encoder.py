"""ViTDet-style SAM image encoder, functional
(reference segment_anything/modeling/image_encoder.py).

TPU-first design notes
----------------------
* Layout is NHWC/channels-last token grids throughout; the MXU sees large
  (tokens × dim) matmuls with no transposes.
* Windowed attention (28 of 32 ViT-H layers, window 14 → 196 tokens) is
  reshaped to one big (B·25windows, 196, C) batch — a single batched matmul,
  not a loop.  The 4 global layers run over all 4096 tokens, which fits
  per-chip; no sequence parallelism needed at SAM scale.
* The decomposed relative-position bias (image_encoder.py:325-361) is two
  einsums against statically-gathered tables; XLA fuses them into the
  attention logits.  A fused Pallas kernel can be swapped in via
  ``attention_impl`` (see samcarriestheburden_tpu.kernels).
* Softmax and LayerNorm statistics stay in fp32; everything else follows the
  requested compute ``dtype`` (bfloat16 for production inference).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samcarriestheburden_tpu.config import ImageEncoderConfig
from samcarriestheburden_tpu.models.common import (
    conv2d, conv2d_init, layer_norm, layer_norm_2d, layer_norm_init,
    linear, linear_init, mlp_block, mlp_block_init)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _block_init(key, cfg: ImageEncoderConfig, window_size: int) -> dict:
    ks = jax.random.split(key, 4)
    ed = cfg.embed_dim
    p = {
        "norm1": layer_norm_init(ed),
        "attn": {
            "qkv": linear_init(ks[0], ed, 3 * ed, bias=cfg.qkv_bias),
            "proj": linear_init(ks[1], ed, ed),
        },
        "norm2": layer_norm_init(ed),
        "mlp": mlp_block_init(ks[2], ed, int(ed * cfg.mlp_ratio)),
    }
    if cfg.use_rel_pos:
        s = window_size if window_size > 0 else cfg.grid_size
        p["attn"]["rel_pos_h"] = jnp.zeros((2 * s - 1, cfg.head_dim))
        p["attn"]["rel_pos_w"] = jnp.zeros((2 * s - 1, cfg.head_dim))
    return p


def init(key, cfg: ImageEncoderConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 3)
    params = {
        "patch_embed": conv2d_init(keys[0], cfg.in_chans, cfg.embed_dim,
                                   (cfg.patch_size, cfg.patch_size)),
        "blocks": [
            _block_init(keys[1 + i], cfg,
                        0 if i in cfg.global_attn_indexes else cfg.window_size)
            for i in range(cfg.depth)
        ],
        "neck": {
            "conv1": conv2d_init(keys[-2], cfg.embed_dim, cfg.out_chans, (1, 1), bias=False),
            "ln1": layer_norm_init(cfg.out_chans),
            "conv2": conv2d_init(keys[-1], cfg.out_chans, cfg.out_chans, (3, 3), bias=False),
            "ln2": layer_norm_init(cfg.out_chans),
        },
    }
    if cfg.use_abs_pos:
        params["pos_embed"] = jnp.zeros((1, cfg.grid_size, cfg.grid_size, cfg.embed_dim))
    return params


# ---------------------------------------------------------------------------
# window partition (static shapes; reference image_encoder.py:243-289)
# ---------------------------------------------------------------------------


def window_partition(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B·nW, ws, ws, C) with bottom/right zero padding."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, window_size, window_size, c)
    return windows, (hp, wp)


def window_partition_flat(x: jnp.ndarray, window_size: int
                          ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B·nW, np, C) flat windows, np = ws² rounded up to 8.

    The 8-multiple token count keeps the 3-D window view and the flat
    (B·nW·np, C) token view PHYSICALLY identical ((8, 128) tiling), so every
    reshape between the window-batched attention kernel and the flat-token
    qkv/MLP kernels is layout-free — the (wb, ws, ws, C) carry of the v3 path
    paid a full HBM copy per reshape (traced round 3, ~10 ms/img on ViT-H).
    Dead slots are zero; the attention kernel masks them with -1e30 logits."""
    windows, pad_hw = window_partition(x, window_size)
    wb = windows.shape[0]
    n = window_size * window_size
    np_ = -(-n // 8) * 8
    flat = windows.reshape(wb, n, x.shape[-1])
    if np_ != n:
        flat = jnp.pad(flat, ((0, 0), (0, np_ - n), (0, 0)))
    return flat, pad_hw


def window_unpartition_flat(flat: jnp.ndarray, window_size: int,
                            pad_hw: Tuple[int, int],
                            hw: Tuple[int, int]) -> jnp.ndarray:
    n = window_size * window_size
    windows = flat[:, :n, :].reshape(-1, window_size, window_size,
                                     flat.shape[-1])
    return window_unpartition(windows, window_size, pad_hw, hw)


def window_unpartition(windows: jnp.ndarray, window_size: int,
                       pad_hw: Tuple[int, int], hw: Tuple[int, int]) -> jnp.ndarray:
    hp, wp = pad_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(b, hp // window_size, wp // window_size, window_size, window_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    return x[:, :h, :w, :]


# ---------------------------------------------------------------------------
# decomposed relative position bias (reference image_encoder.py:292-361)
# ---------------------------------------------------------------------------


def _rel_pos_indices(q_size: int, k_size: int) -> np.ndarray:
    """Static gather indices into the rel-pos table (get_rel_pos:317-322)."""
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel.astype(np.int64)


def resize_rel_pos_table(rel_pos: jnp.ndarray, max_rel_dist: int) -> jnp.ndarray:
    """Linearly interpolate a (L, C) rel-pos table to ``max_rel_dist`` rows
    (get_rel_pos:304-315, torch F.interpolate mode='linear' align_corners=False)."""
    if rel_pos.shape[0] == max_rel_dist:
        return rel_pos
    resized = jax.image.resize(rel_pos.astype(jnp.float32),
                               (max_rel_dist, rel_pos.shape[1]), method="linear")
    return resized


def add_decomposed_rel_pos(attn: jnp.ndarray, q: jnp.ndarray,
                           rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
                           q_size: Tuple[int, int], k_size: Tuple[int, int]) -> jnp.ndarray:
    """attn: (B, q_h·q_w, k_h·k_w) fp32; q: (B, q_h·q_w, head_dim).
    Matches reference add_decomposed_rel_pos (image_encoder.py:325-361).

    TPU note: the reference adds the bias through a 5-D view
    (B, q_h, q_w, k_h, k_w) whose trailing dimension is the window size
    (14 or 64) — a lane-dimension disaster on TPU vregs (128 lanes).  Here the
    bias is assembled directly in the flattened k axis via repeat/tile, so all
    elementwise work runs at full (k_h·k_w)-lane width."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = resize_rel_pos_table(rel_pos_h, 2 * max(q_h, k_h) - 1)[_rel_pos_indices(q_h, k_h)]
    rw = resize_rel_pos_table(rel_pos_w, 2 * max(q_w, k_w) - 1)[_rel_pos_indices(q_w, k_w)]

    b, nq, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh.astype(q.dtype),
                       preferred_element_type=jnp.float32).reshape(b, nq, k_h)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw.astype(q.dtype),
                       preferred_element_type=jnp.float32).reshape(b, nq, k_w)
    # flattened k index = kh * k_w + kw:
    #   rel_h entry kh spans k_w consecutive lanes  -> repeat
    #   rel_w entries cycle per kh block            -> tile
    bias = (jnp.repeat(rel_h, k_w, axis=-1)
            + jnp.tile(rel_w, (1, 1, k_h)))
    return attn + bias


# ---------------------------------------------------------------------------
# attention (reference image_encoder.py:185-240)
# ---------------------------------------------------------------------------


def attention_apply(p: dict, x: jnp.ndarray, num_heads: int,
                    use_rel_pos: bool) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, C); fp32 logits + softmax."""
    b, h, w, c = x.shape
    hd = c // num_heads
    scale = hd ** -0.5

    qkv = linear(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(3, b * num_heads, h * w, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    attn = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    if use_rel_pos:
        attn = add_decomposed_rel_pos(attn, q, p["rel_pos_h"], p["rel_pos_w"],
                                      (h, w), (h, w))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkd->bqd", attn, v)
    out = out.reshape(b, num_heads, h, w, hd)
    out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, c)
    return linear(p["proj"], out)


# ---------------------------------------------------------------------------
# block + forward
# ---------------------------------------------------------------------------


def _mlp_residual(p: dict, x: jnp.ndarray, cfg: ImageEncoderConfig,
                  fused: bool, add: jnp.ndarray = None,
                  quantize: str = None) -> jnp.ndarray:
    """x + mlp(LN2(x)) — via the fused Pallas kernel (one HBM round-trip,
    kernels/mlp.py) when ``fused``, else the XLA composition.  ``add`` folds
    the block's attention residual into the same pass (x := x + add).
    ``quantize='int8'`` routes through the int8 kernel (kernels/quant.py;
    opt-in serving mode) and requires PREQUANTIZED params
    (models/quantize.prequantize_image_encoder — quantizing 0.6B weights
    inside the jitted forward costs an HBM pass per call, VERDICT round 2);
    ``'int8_xla'`` is the plain-jnp mirror of the same arithmetic (CPU-
    runnable accuracy-gate path, tests/test_quantize.py)."""
    if fused and quantize in ("int8", "int8_xla"):
        from samcarriestheburden_tpu.kernels.quant import (
            fused_ln_mlp_residual_int8, ln_mlp_residual_int8_xla)

        l1, l2 = p["mlp"]["lin1"], p["mlp"]["lin2"]
        lead = x.shape[:-1]
        e = x.shape[-1]
        fn = (fused_ln_mlp_residual_int8 if quantize == "int8"
              else ln_mlp_residual_int8_xla)
        y = fn(x.reshape(-1, e), p["norm2"]["scale"], p["norm2"]["bias"],
               l1["wq"], l1["s"], l1["b"], l2["wq"], l2["s"], l2["b"],
               add=add.reshape(-1, e) if add is not None else None,
               eps=cfg.layer_norm_eps)
        return y.reshape(*lead, e)
    if fused:
        from samcarriestheburden_tpu.kernels.mlp import mlp_residual_apply

        return mlp_residual_apply(p["norm2"], p["mlp"], x,
                                  eps=cfg.layer_norm_eps, add=add)
    if add is not None:
        x = x + add
    return x + mlp_block(p["mlp"], layer_norm(p["norm2"], x, cfg.layer_norm_eps))


def block_apply(p: dict, x: jnp.ndarray, cfg: ImageEncoderConfig,
                window_size: int, attention_impl=attention_apply,
                fused_mlp: bool = False, fused_qkv: bool = False,
                quantize: str = None) -> jnp.ndarray:
    shortcut = x
    if fused_qkv and window_size == 0 and cfg.use_rel_pos:
        a = _global_attention_headmajor(p, x, cfg, quantize=quantize)
        return _mlp_residual(p, shortcut, cfg, fused_mlp, add=a,
                             quantize=quantize)
    x = layer_norm(p["norm1"], x, cfg.layer_norm_eps)
    if window_size > 0:
        h, w = x.shape[1], x.shape[2]
        x, pad_hw = window_partition(x, window_size)
    x = attention_impl(p["attn"], x, cfg.num_heads, cfg.use_rel_pos)
    if window_size > 0:
        x = window_unpartition(x, window_size, pad_hw, (h, w))
    x = shortcut + x
    return _mlp_residual(p, x, cfg, fused_mlp, quantize=quantize)


def _global_attention_headmajor(p: dict, x: jnp.ndarray,
                                cfg: ImageEncoderConfig,
                                interpret: bool = False,
                                quantize: str = None) -> jnp.ndarray:
    """Transpose-free global-layer attention (see
    :func:`_windowed_attention_headmajor`; q-blocked kernel variant with
    in-kernel rel-pos — the v3 out-of-kernel rel path cost ~2 ms/img in
    einsum/select/copy glue for the 4 ViT-H global layers, traced round 3)."""
    from samcarriestheburden_tpu.kernels.attention import (
        fused_rel_attention_global3d, prepare_rel_tables_window3d)

    b, gh, gw, e = x.shape
    n = gh * gw
    heads = cfg.num_heads
    hd = e // heads
    t = b * n
    wq, sq, bq = _qkv_pack(p["attn"], heads, x.dtype, quantize)
    ones = jnp.ones((t, 1), x.dtype)
    qkv = _ln_qkv(x.reshape(t, e), ones, p["norm1"], wq, sq, bq,
                  cfg.layer_norm_eps, quantize, interpret)

    pad = wq.shape[1] // heads
    if quantize == "int8_xla":
        rel_h, rel_w = _rel_bias_headmajor(qkv, p["attn"], heads=heads,
                                           pad=pad, hd=hd, b=b, gh=gh, gw=gw,
                                           dtype=x.dtype)
        out = _headmajor_attention_xla(qkv.reshape(b, n, heads * pad),
                                       rel_h, rel_w, heads=heads, hd=hd,
                                       kh=gh, kw=gw, int8_qk=True)
    else:
        tcat = prepare_rel_tables_window3d(p["attn"], gh, x.dtype, ws_w=gw)
        out = fused_rel_attention_global3d(
            qkv.reshape(b, n, heads * pad), tcat,
            kh=gh, kw=gw, heads=heads, hd=hd,
            int8_qk=(quantize == "int8"), interpret=interpret)

    proj = p["attn"]["proj"]
    wp = proj["w"].reshape(heads, hd, e).astype(x.dtype)
    a = jax.lax.dot_general(out.reshape(heads, t, hd), wp,
                            (((0, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    if "b" in proj:
        a = a + proj["b"].astype(jnp.float32)
    return a.reshape(b, gh, gw, e).astype(x.dtype)


def _block_apply_windowed(p: dict, xw: jnp.ndarray, pad_valid: jnp.ndarray,
                          cfg: ImageEncoderConfig,
                          attention_impl, fused_mlp: bool = False,
                          fused_qkv: bool = False,
                          quantize: str = None) -> jnp.ndarray:
    """Windowed block evaluated *in window layout* (B·nW, ws, ws, C).

    Numerically identical to partition→block_apply→unpartition: the reference
    re-zeroes padded positions at every partition (they are created from a
    fresh zero-pad each block, image_encoder.py:256-259); here the same
    positions are masked to zero after norm1, which is where their value could
    first reach a real token (window-local attention).  All other ops are
    pointwise, so pad-slot contents never leak."""
    shortcut = xw
    if fused_qkv:
        a = _windowed_attention_headmajor(p, xw, pad_valid, cfg,
                                          quantize=quantize)
        return _mlp_residual(p, shortcut, cfg, fused_mlp, add=a,
                             quantize=quantize)
    x = layer_norm(p["norm1"], xw, cfg.layer_norm_eps) * pad_valid
    x = attention_impl(p["attn"], x, cfg.num_heads, cfg.use_rel_pos)
    x = shortcut + x
    return _mlp_residual(p, x, cfg, fused_mlp, quantize=quantize)


def _rel_bias_headmajor(qkv2d: jnp.ndarray, p_attn: dict, *, heads: int,
                        pad: int, hd: int, b: int, gh: int, gw: int, dtype):
    """Decomposed rel-pos biases from the head-major qkv activations.

    The obvious formulation — slice q out of the per-head [q|k|v|pad] column
    groups and run the p-batched einsum ``bpqhc,pkc->hbpqk`` — costs ~10 ms/img
    on ViT-H in pure data movement (traced round 3): the 80-of-256 lane slice,
    the p-major operand transpose of a 50 MB tensor and the 14-lane outputs
    all relayout in HBM.  Instead:

    1. contract the FULL padded qkv against zero-padded rel tables — one
       plain (T·heads, pad) x (pad, Rh+Rw) matmul, no slice, no transpose
       (zeros in the table rows beyond q's columns kill the k/v/pad parts);
    2. gather table rows by relative offset as a tiny one-hot einsum over the
       R-row axis (R = 2·ws-1), which is 14x fewer FLOPs than contracting
       over head_dim and moves (T·heads, R) fp32 instead of q itself.

    Returns rel_h (heads, b, n, gh), rel_w (heads, b, n, gw) in ``dtype``.
    """
    t = b * gh * gw
    n = gh * gw
    rh_max, rw_max = 2 * gh - 1, 2 * gw - 1
    th = resize_rel_pos_table(p_attn["rel_pos_h"], rh_max)      # (Rh, hd)
    tw = resize_rel_pos_table(p_attn["rel_pos_w"], rw_max)
    tcat = jnp.concatenate([th, tw], axis=0)
    tcat = jnp.pad(tcat, ((0, 0), (0, pad - hd))).astype(dtype)

    g = jnp.einsum("thc,rc->thr", qkv2d.reshape(t, heads, pad), tcat,
                   preferred_element_type=jnp.float32)
    g = g.reshape(b, gh, gw, heads, rh_max + rw_max)

    sel_h = jnp.asarray(np.eye(rh_max, dtype=np.float32)[
        _rel_pos_indices(gh, gh)])                              # (gh, gh, Rh)
    sel_w = jnp.asarray(np.eye(rw_max, dtype=np.float32)[
        _rel_pos_indices(gw, gw)])
    rel_h = jnp.einsum("bpqhr,pkr->hbpqk", g[..., :rh_max], sel_h,
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bpqhr,qkr->hbpqk", g[..., rh_max:], sel_w,
                       preferred_element_type=jnp.float32)
    return (rel_h.reshape(heads, b, n, gh).astype(dtype),
            rel_w.reshape(heads, b, n, gw).astype(dtype))


def _qkv_pack(p_attn: dict, heads: int, dtype, quantize):
    """Head-major qkv weights: the prequantized int8 pack when present
    (models/quantize.py), else packed on the fly from the fp qkv weight."""
    if quantize in ("int8", "int8_xla"):
        pk = p_attn["qkv_hm"]
        return pk["wq"], pk["s"], pk["b"]
    from samcarriestheburden_tpu.kernels.attention import prepare_qkv_headmajor

    w, b = prepare_qkv_headmajor(p_attn, heads, dtype)
    return w, None, b


def _ln_qkv(x2d, mask, p_norm, wq, sq, bq, eps, quantize, interpret):
    """LN + pad re-zeroing + head-grouped qkv projection, bf16 or
    prequantized-int8 fused kernel (kernels/mlp.py / kernels/quant.py)."""
    if quantize in ("int8", "int8_xla"):
        from samcarriestheburden_tpu.kernels.quant import (
            fused_ln_masked_linear_int8, ln_masked_linear_int8_xla)

        if quantize == "int8_xla":
            return ln_masked_linear_int8_xla(
                x2d, mask, p_norm["scale"], p_norm["bias"], wq, sq, bq,
                eps=eps)
        return fused_ln_masked_linear_int8(
            x2d, mask, p_norm["scale"], p_norm["bias"], wq, sq, bq,
            eps=eps, interpret=interpret)
    from samcarriestheburden_tpu.kernels.mlp import fused_ln_masked_linear

    return fused_ln_masked_linear(x2d, mask, p_norm["scale"], p_norm["bias"],
                                  wq, bq, eps=eps, interpret=interpret)


def _windowed_attention_headmajor(p: dict, xw: jnp.ndarray,
                                  pad_valid: jnp.ndarray,
                                  cfg: ImageEncoderConfig,
                                  interpret: bool = False,
                                  quantize: str = None) -> jnp.ndarray:
    """Transpose-free windowed attention: LN1 + pad re-zeroing + qkv fuse into
    one Pallas pass emitting per-head column groups; the head-major kernel
    slices heads via its BlockSpec; the output projection contracts
    (head, hd) jointly — no head-split transpose/slice/squeeze touches HBM
    (they were ~16 ms/img in the v1 path's trace).  Numerically equivalent to
    ``layer_norm -> attention_apply -> proj`` (interpret-tested)."""
    from samcarriestheburden_tpu.kernels.attention import \
        fused_rel_attention_headmajor

    wb, ws, _, e = xw.shape
    n = ws * ws
    heads = cfg.num_heads
    hd = e // heads
    t = wb * n
    wq, sq, bq = _qkv_pack(p["attn"], heads, xw.dtype, quantize)
    qkv = _ln_qkv(xw.reshape(t, e), pad_valid.reshape(t, 1), p["norm1"],
                  wq, sq, bq, cfg.layer_norm_eps, quantize, interpret)

    pad = wq.shape[1] // heads
    rel_h, rel_w = _rel_bias_headmajor(qkv, p["attn"], heads=heads, pad=pad,
                                       hd=hd, b=wb, gh=ws, gw=ws,
                                       dtype=xw.dtype)

    if quantize == "int8_xla":
        out = _headmajor_attention_xla(qkv.reshape(wb, n, heads * pad),
                                       rel_h, rel_w, heads=heads, hd=hd,
                                       kh=ws, kw=ws)
    else:
        out = fused_rel_attention_headmajor(
            qkv.reshape(wb, n, heads * pad), rel_h, rel_w,
            kh=ws, kw=ws, heads=heads, hd=hd,
            interpret=interpret)                            # (h, wb, n, hd)

    proj = p["attn"]["proj"]
    wp = proj["w"].reshape(heads, hd, e).astype(xw.dtype)
    a = jax.lax.dot_general(out.reshape(heads, t, hd), wp,
                            (((0, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    if "b" in proj:
        a = a + proj["b"].astype(jnp.float32)
    return a.reshape(wb, ws, ws, e).astype(xw.dtype)


def _windowed_attention_headmajor3d(p: dict, x3: jnp.ndarray,
                                    pad3: jnp.ndarray,
                                    cfg: ImageEncoderConfig,
                                    interpret: bool = False,
                                    quantize: str = None) -> jnp.ndarray:
    """v4 windowed attention over flat (Wb, np, E) windows: the rel-pos
    projection AND table select run inside the kernel
    (kernels.attention.fused_rel_attention_window3d), so no rel-shaped or
    window-reshaped tensor ever round-trips HBM (v3 paid ~13 ms/img there)."""
    from samcarriestheburden_tpu.kernels.attention import (
        fused_rel_attention_window3d, prepare_rel_tables_window3d)

    wb, np_, e = x3.shape
    ws = cfg.window_size
    heads = cfg.num_heads
    hd = e // heads
    t = wb * np_
    wq, sq, bq = _qkv_pack(p["attn"], heads, x3.dtype, quantize)
    qkv = _ln_qkv(x3.reshape(t, e), pad3.reshape(t, 1), p["norm1"],
                  wq, sq, bq, cfg.layer_norm_eps, quantize, interpret)

    pad = wq.shape[1] // heads
    tcat = prepare_rel_tables_window3d(p["attn"], ws, x3.dtype)
    out = fused_rel_attention_window3d(
        qkv.reshape(wb, np_, heads * pad), tcat, ws=ws, heads=heads, hd=hd,
        interpret=interpret)                                # (h, wb, np, hd)

    proj = p["attn"]["proj"]
    wp = proj["w"].reshape(heads, hd, e).astype(x3.dtype)
    a = jax.lax.dot_general(out.reshape(heads, t, hd), wp,
                            (((0, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    if "b" in proj:
        a = a + proj["b"].astype(jnp.float32)
    return a.reshape(wb, np_, e).astype(x3.dtype)


def _block_apply_windowed3d(p: dict, x3: jnp.ndarray, pad3: jnp.ndarray,
                            cfg: ImageEncoderConfig, fused_mlp: bool,
                            quantize: str = None) -> jnp.ndarray:
    """Windowed block over flat (Wb, np, E) windows (see
    :func:`window_partition_flat`); numerically ≡ _block_apply_windowed on
    the live n = ws² slots (dead slots carry junk, masked at unpartition)."""
    a = _windowed_attention_headmajor3d(p, x3, pad3, cfg, quantize=quantize)
    return _mlp_residual(p, x3, cfg, fused_mlp, add=a, quantize=quantize)


# ---------------------------------------------------------------------------
# compact ragged-window layout (serving mode): the reference zero-pads the
# token grid up to a window multiple (reference image_encoder.py:256-259,
# ViT-H: 70² padded vs 64² real = +19.6% tokens) and computes every layer on
# the pad tokens too.  But pad-slot OUTPUTS are never consumed — each layer
# re-zeroes pads after norm1, so their k/v are closed-form bias vectors and
# everything else about them is dead compute.  The compact layout carries
# ONLY real tokens: full interior windows go through the standard window3d
# kernel, edge/corner windows through the rect kernel whose analytic pad-key
# group reproduces the pad contribution exactly (kernels/attention.py:
# _attn_kernel_window_rect).  LN/qkv/MLP run on the compact stream: 4208
# slot-rows/img instead of 5000 on ViT-H.
# ---------------------------------------------------------------------------


def compact_window_groups(h: int, w: int, ws: int):
    """Static descriptor of the compact ragged-window layout for an (h, w)
    token grid: stream-ordered groups [interior | right-edge | bottom strip]
    with carried window shape (rh, rw), window grid counts (nh, nw), region
    origin (y0, x0) and 8-aligned slot count np.  The bottom strip spans the
    FULL width — its slots beyond the image (the old corner's pad columns)
    ride as zero-masked stream slots whose k/v are therefore the qkv biases,
    i.e. exactly the reference's zero-pad tokens.  (Also keeps the rect
    kernel off the rh=rw=8 shape that SIGABRTs the Mosaic compiler.)
    Empty groups are dropped."""
    h0, w0 = (h // ws) * ws, (w // ws) * ws
    eh = h - h0
    groups = []

    def add(rh, rw, nh, nw, y0, x0):
        if nh and nw and rh and rw:
            groups.append(dict(rh=rh, rw=rw, nh=nh, nw=nw, y0=y0, x0=x0,
                               np=-(-(rh * rw) // 8) * 8))

    add(ws, ws, h0 // ws, w0 // ws, 0, 0)
    add(ws, w - w0, h0 // ws, 1, 0, w0)
    add(eh, ws, 1, -(-w // ws), h0, 0)
    return groups


def _compact_group_mask(g, h, w):
    """(nh·nw·np, 1) float mask of IMAGE positions for one group (0 both for
    beyond-image window columns — the reference pad tokens — and for the
    8-alignment dead slots)."""
    rh, rw, nh, nw, np_ = g["rh"], g["rw"], g["nh"], g["nw"], g["np"]
    s = np.arange(np_)
    p, q = s // rw, s % rw
    m = np.zeros((nh, nw, np_, 1), np.float32)
    for i in range(nh):
        for j in range(nw):
            ok = ((s < rh * rw) & (g["y0"] + i * rh + p < h)
                  & (g["x0"] + j * rw + q < w))
            m[i, j, :, 0] = ok
    return m.reshape(nh * nw * np_, 1)


def window_partition_compact(x: jnp.ndarray, ws: int, groups):
    """(B, H, W, C) -> per-group [(x3 (Wb, np, C), mask3 (Wb, np, 1))].
    Windows never talk to each other inside a windowed run, so each group
    stays a SEPARATE carry (its own lax.scan over the blocks) — no per-layer
    slicing/concatenation of a joint stream (traced: the joint-stream
    variant spent +2.2 ms/img in slice/concat, exactly cancelling the
    compact savings).  Pure slice/pad/reshape/transpose, no gathers."""
    b, h, w, c = x.shape
    parts = []
    for g in groups:
        rh, rw, nh, nw, np_ = g["rh"], g["rw"], g["nh"], g["nw"], g["np"]
        n = rh * rw
        blk = x[:, g["y0"]:g["y0"] + nh * rh, g["x0"]:g["x0"] + nw * rw, :]
        ph, pw = nh * rh - blk.shape[1], nw * rw - blk.shape[2]
        if ph or pw:  # bottom strip: beyond-image columns ride as zeros
            blk = jnp.pad(blk, ((0, 0), (0, ph), (0, pw), (0, 0)))
        blk = blk.reshape(b, nh, rh, nw, rw, c)
        blk = jnp.transpose(blk, (0, 1, 3, 2, 4, 5)).reshape(
            b * nh * nw, n, c)
        if np_ != n:
            blk = jnp.pad(blk, ((0, 0), (0, np_ - n), (0, 0)))
        m = jnp.asarray(np.tile(
            _compact_group_mask(g, h, w).reshape(nh * nw, np_, 1),
            (b, 1, 1)), x.dtype)
        parts.append((blk, m))
    return parts


def window_unpartition_compact(parts, ws: int, groups, b: int,
                               hw) -> jnp.ndarray:
    """Inverse of :func:`window_partition_compact` -> (B, H, W, C)."""
    h, w = hw
    regions = {}
    for g, blk in zip(groups, parts):
        rh, rw, nh, nw, np_ = g["rh"], g["rw"], g["nh"], g["nw"], g["np"]
        c = blk.shape[-1]
        blk = blk.reshape(b, nh, nw, np_, c)[:, :, :, :rh * rw, :]
        blk = blk.reshape(b, nh, nw, rh, rw, c)
        blk = jnp.transpose(blk, (0, 1, 3, 2, 4, 5)).reshape(
            b, nh * rh, nw * rw, c)
        # clip the bottom strip's beyond-image columns back off
        blk = blk[:, :min(nh * rh, h - g["y0"]), :min(nw * rw, w - g["x0"])]
        regions[(g["y0"], g["x0"])] = blk
    rows_ = []
    for y0 in sorted({k[0] for k in regions}):
        cells = [regions[k] for k in sorted(regions) if k[0] == y0]
        rows_.append(jnp.concatenate(cells, axis=2) if len(cells) > 1
                     else cells[0])
    return jnp.concatenate(rows_, axis=1) if len(rows_) > 1 else rows_[0]


def _windowed_attention_rect3d(p: dict, x3: jnp.ndarray, pad3: jnp.ndarray,
                               cfg: ImageEncoderConfig, rh: int, rw: int,
                               interpret: bool = False,
                               quantize: str = None) -> jnp.ndarray:
    """Edge/corner-group analogue of :func:`_windowed_attention_headmajor3d`:
    x3 carries only the rh×rw REAL tokens of each ws×ws window; the rect
    kernel synthesizes the zero-pad keys (= qkv biases) in VMEM
    (kernels/attention._attn_kernel_window_rect)."""
    from samcarriestheburden_tpu.kernels.attention import (
        fused_rel_attention_window_rect, prepare_rel_tables_window3d)

    wb, np_, e = x3.shape
    ws = cfg.window_size
    heads = cfg.num_heads
    hd = e // heads
    t = wb * np_
    wq, sq, bq = _qkv_pack(p["attn"], heads, x3.dtype, quantize)
    qkv = _ln_qkv(x3.reshape(t, e), pad3.reshape(t, 1), p["norm1"],
                  wq, sq, bq, cfg.layer_norm_eps, quantize, interpret)

    pad = wq.shape[1] // heads
    tcat = prepare_rel_tables_window3d(p["attn"], ws, x3.dtype)
    bkv = bq.reshape(heads, pad).astype(x3.dtype)
    out = fused_rel_attention_window_rect(
        qkv.reshape(wb, np_, heads * pad), tcat, bkv, ws=ws, rh=rh, rw=rw,
        heads=heads, hd=hd, interpret=interpret)            # (h, wb, np, hd)

    proj = p["attn"]["proj"]
    wp = proj["w"].reshape(heads, hd, e).astype(x3.dtype)
    a = jax.lax.dot_general(out.reshape(heads, t, hd), wp,
                            (((0, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    if "b" in proj:
        a = a + proj["b"].astype(jnp.float32)
    return a.reshape(wb, np_, e).astype(x3.dtype)


def _block_apply_windowed_compact(p: dict, x3: jnp.ndarray, pad3: jnp.ndarray,
                                  cfg: ImageEncoderConfig, g,
                                  fused_mlp: bool,
                                  quantize: str = None) -> jnp.ndarray:
    """Windowed block over ONE compact group; numerically ≡
    _block_apply_windowed3d on real token positions (the pad tokens'
    compute is replaced by the rect kernel's exact synthesized keys)."""
    ws = cfg.window_size
    if g["rh"] == ws and g["rw"] == ws:
        return _block_apply_windowed3d(p, x3, pad3, cfg, fused_mlp, quantize)
    a = _windowed_attention_rect3d(p, x3, pad3, cfg, g["rh"], g["rw"],
                                   quantize=quantize)
    return _mlp_residual(p, x3, cfg, fused_mlp, add=a, quantize=quantize)


def _headmajor_attention_xla(qkv: jnp.ndarray, rel_h: jnp.ndarray,
                             rel_w: jnp.ndarray, *, heads: int, hd: int,
                             kh: int, kw: int,
                             int8_qk: bool = False) -> jnp.ndarray:
    """Plain-jnp mirror of the fused head-major attention kernels (same
    (B, n, heads·pad) input / (heads, B, n, hd) output contract) for the
    CPU-runnable int8 accuracy-gate path — Mosaic kernels need hardware.
    ``int8_qk`` mirrors the kernel's dynamic q/k quantization (per-channel k
    scales folded into q, per-row q scales) in fp32 arithmetic — exact,
    since int8·int8 dot accumulants stay below 2^24."""
    b, n, _ = qkv.shape
    x4 = qkv.reshape(b, n, heads, -1)
    q, k, v = x4[..., :hd], x4[..., hd:2 * hd], x4[..., 2 * hd:3 * hd]
    if int8_qk:
        kf = k.astype(jnp.float32)
        sk_c = jnp.max(jnp.abs(kf), axis=1, keepdims=True) / 127.0 + 1e-12
        ki = jnp.round(kf / sk_c)
        qs = q.astype(jnp.float32) * sk_c
        sq_r = jnp.max(jnp.abs(qs), axis=-1, keepdims=True) / 127.0 + 1e-12
        qi = jnp.round(qs / sq_r)
        attn = (jnp.einsum("bnhc,bmhc->hbnm", qi, ki,
                           preferred_element_type=jnp.float32)
                * jnp.moveaxis(sq_r, 2, 0) * (hd ** -0.5))
    else:
        attn = jnp.einsum("bnhc,bmhc->hbnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
    bias = (jnp.repeat(rel_h.astype(jnp.float32), kw, axis=-1)
            + jnp.tile(rel_w.astype(jnp.float32), (1, 1, 1, kh)))
    attn = jax.nn.softmax(attn + bias, axis=-1)
    return jnp.einsum("hbnm,bmhc->hbnc", attn.astype(v.dtype), v)


def _pad_valid_mask(b: int, h: int, w: int, window_size: int, dtype) -> jnp.ndarray:
    """(B·nW, ws, ws, 1) mask of real (non-padded) token positions."""
    ones = jnp.ones((b, h, w, 1), dtype)
    mask, _ = window_partition(ones, window_size)
    return mask


def _block_apply_windowed_fused(p: dict, xw: jnp.ndarray, pad_valid: jnp.ndarray,
                                cfg: ImageEncoderConfig,
                                interpret: bool = False) -> jnp.ndarray:
    """Windowed block via the fused window-block attention kernel
    (kernels.attention.fused_window_block_attention): LN1 → per-head qkv,
    rel-pos bias, softmax, value and output projection all in one kernel —
    no head-split or attention-output transposes touch HBM.  Numerically
    equivalent to :func:`_block_apply_windowed` (interpret-mode tested)."""
    from samcarriestheburden_tpu.kernels.attention import (
        fused_window_block_attention, prepare_block_attn_weights)
    from samcarriestheburden_tpu.kernels.mlp import mlp_residual_apply

    wb, ws, _, e = xw.shape
    wts = prepare_block_attn_weights(p["attn"], cfg.num_heads, ws,
                                     dtype=xw.dtype)
    shortcut = xw
    xn = layer_norm(p["norm1"], xw, cfg.layer_norm_eps) * pad_valid
    a = fused_window_block_attention(
        xn.reshape(wb, ws * ws, e), wts["wq"], wts["wk"], wts["wv"],
        wts["bqkv"], wts["wp"], wts["texp_h"], wts["texp_w"],
        ws=ws, heads=cfg.num_heads, interpret=interpret)
    x = a.reshape(wb, ws, ws, e)
    if wts["proj_b"] is not None:
        x = x + wts["proj_b"].astype(x.dtype)
    x = shortcut + x
    return mlp_residual_apply(p["norm2"], p["mlp"], x, eps=cfg.layer_norm_eps,
                              interpret=interpret)


def apply(params: dict, cfg: ImageEncoderConfig, x: jnp.ndarray, *,
          dtype=jnp.float32, attention_impl=attention_apply,
          persistent_windows: bool = True,
          fused_window_blocks: bool = False,
          fused_mlp: bool = False,
          fused_qkv: bool = False,
          quantize: str = None,
          compact_windows: bool = False,
          scan_blocks: bool = True) -> jnp.ndarray:
    """(B, 3, img, img) NCHW in (API parity) -> (B, out_chans, grid, grid) NCHW out.

    ``dtype`` is the compute precision for the transformer stack (bfloat16 on
    TPU for production; fp32 for parity tests).  ``persistent_windows`` keeps
    activations in window layout across consecutive windowed blocks
    (ViT-H: 7 of every 8), eliminating ~6/7 of the 20 MB partition/unpartition
    transposes; the per-layer pad re-zeroing preserves exact reference
    numerics (see _block_apply_windowed).
    """
    if quantize in ("int8", "int8_xla"):
        from samcarriestheburden_tpu.models.quantize import is_prequantized

        assert fused_mlp and fused_qkv, \
            "quantize='int8' runs only on the fused TPU path"
        assert is_prequantized(params["blocks"][0]), \
            "quantize='int8' requires models.quantize.prequantize_image_encoder"
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)  # NHWC
    x = conv2d(params["patch_embed"], x,
               stride=(cfg.patch_size, cfg.patch_size), padding="VALID")
    if cfg.use_abs_pos:
        x = x + params["pos_embed"].astype(dtype)

    if persistent_windows and cfg.window_size > 0:
        b, h, w, _ = x.shape
        ws = cfg.window_size
        pad_valid = _pad_valid_mask(b, h, w, ws, x.dtype)
        pad_hw = None
        # v4 flat-window path: reshape-free carry + in-kernel rel-pos
        flat3d = fused_qkv and quantize != "int8_xla" \
            and not fused_window_blocks
        compact = compact_windows and flat3d and (h % ws or w % ws)
        if compact:
            groups = compact_window_groups(h, w, ws)
        if flat3d:
            n = ws * ws
            np_ = -(-n // 8) * 8
            pad_flat = pad_valid.reshape(-1, n, 1)
            if np_ != n:
                pad_flat = jnp.pad(pad_flat, ((0, 0), (0, np_ - n), (0, 0)))

        def one_windowed(blk, xw):
            if flat3d:
                return _block_apply_windowed3d(blk, xw, pad_flat, cfg,
                                               fused_mlp, quantize)
            if fused_window_blocks:
                return _block_apply_windowed_fused(blk, xw, pad_valid, cfg)
            return _block_apply_windowed(blk, xw, pad_valid, cfg,
                                         attention_impl, fused_mlp,
                                         fused_qkv, quantize)

        def run_windowed(idxs, xw, body=None):
            """A run of consecutive windowed blocks as ONE lax.scan over
            stacked params — the block body compiles once instead of once
            per layer (the 28 inlined ViT-H bodies made the remote encoder
            compile take minutes)."""
            body = body or one_windowed
            if len(idxs) == 1 or not scan_blocks:
                for i in idxs:
                    xw = body(params["blocks"][i], xw)
                return xw
            stacked = jax.tree.map(lambda *ls: jnp.stack(ls),
                                   *[params["blocks"][i] for i in idxs])

            def sbody(carry, blk):
                return body(blk, carry), None

            out, _ = jax.lax.scan(sbody, xw, stacked)
            return out

        run: list = []
        i = 0
        n_blocks = len(params["blocks"])
        while i <= n_blocks:
            is_global = i < n_blocks and i in cfg.global_attn_indexes
            if (i == n_blocks or is_global) and run:
                if compact:
                    # each group runs the whole multi-block scan on its own
                    # carry — windows are independent within a run
                    parts = window_partition_compact(x, ws, groups)
                    outs = [run_windowed(
                        run, x3,
                        lambda blk, xw, g=g, pad3=pad3:
                        _block_apply_windowed_compact(blk, xw, pad3, cfg, g,
                                                      fused_mlp, quantize))
                        for g, (x3, pad3) in zip(groups, parts)]
                    x = window_unpartition_compact(outs, ws, groups, b,
                                                   (h, w))
                elif flat3d:
                    x, pad_hw = window_partition_flat(x, ws)
                    x = run_windowed(run, x)
                    x = window_unpartition_flat(x, ws, pad_hw, (h, w))
                else:
                    x, pad_hw = window_partition(x, ws)
                    x = run_windowed(run, x)
                    x = window_unpartition(x, ws, pad_hw, (h, w))
                run = []
            if i == n_blocks:
                break
            if is_global:
                x = block_apply(params["blocks"][i], x, cfg, 0,
                                attention_impl, fused_mlp, fused_qkv,
                                quantize)
            else:
                run.append(i)
            i += 1
    else:
        for i, blk in enumerate(params["blocks"]):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = block_apply(blk, x, cfg, ws, attention_impl, fused_mlp,
                            fused_qkv if ws == 0 else False, quantize)

    n = params["neck"]
    x = x.astype(jnp.float32)
    x = conv2d(n["conv1"], x, padding="VALID")
    x = layer_norm_2d(n["ln1"], x, eps=1e-6)
    x = conv2d(n["conv2"], x, padding=[(1, 1), (1, 1)])
    x = layer_norm_2d(n["ln2"], x, eps=1e-6)
    return jnp.transpose(x, (0, 3, 1, 2))  # NCHW
