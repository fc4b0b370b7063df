"""Micro-experiments: softmax formulation cost in the fused attention kernels.

The round-3 b8 trace has windowed attn at 6.2 ms/img and global attn at
6.0 ms/img against ~1.3/1.7 ms of pure matmul — the gap is VPU work, and the
biggest single suspect is the softmax divide: ``probs = exp / sum`` runs a
full-width divide over n lanes (200 windowed, 4096 global) before AV, when
normalising AFTER AV needs only an hd=80-wide multiply by the row reciprocal.
The kernels also cast probs to bf16 for the AV dot anyway, so computing exp
in bf16 gives up nothing that the cast did not already.

Variants (both kernel families, ViT-H batch-8 shapes):
  v1  current: f32 exp, divide pre-AV
  v2  f32 exp, post-AV reciprocal multiply
  v3  bf16 exp, post-AV reciprocal multiply

Usage: python tools/exp_attn.py [win|glob|mlp|qkv ...]   (default: win glob)
"""

from __future__ import annotations

import sys
import tempfile
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEADS, HD = 16, 80
WS = 14
NP = 200
WB = 200          # 25 windows x batch 8
GB, GN = 8, 4096  # global layers at batch 8
ITERS = 10


def _trace_run(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{name}] compiled+first in {time.perf_counter()-t0:.1f}s "
          f"sum={s:.6e}", flush=True)
    tmp = tempfile.mkdtemp(prefix=f"tr_{name}_")
    with jax.profiler.trace(tmp):
        for _ in range(ITERS):
            float(jnp.sum(fn(*args).astype(jnp.float32)))
    from parse_trace import find_xplane
    import json
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([find_xplane(tmp)],
                                      "framework_op_stats", {})
    tables = json.loads(data)
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in tables[0]["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"
           and "pallas" in r["operation"]]
    t = sum(r["total_self_time"] for r in dev) / ITERS
    print(f"--- {name}: pallas device {t:.1f} us/iter ---", flush=True)
    return t


def _softmax_av(logits, v, variant, dims):
    """logits f32 -> attention output, three formulations."""
    dt = v.dtype
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    if variant == "v1":
        probs = jnp.exp(logits)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        return jax.lax.dot_general(probs.astype(dt), v, dims,
                                   preferred_element_type=jnp.float32)
    if variant == "v2":
        probs = jnp.exp(logits)
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(probs.astype(dt), v, dims,
                                  preferred_element_type=jnp.float32)
        return out * (1.0 / denom)
    assert variant == "v3"
    probs = jnp.exp(logits.astype(jnp.bfloat16))
    denom = jnp.sum(probs.astype(jnp.float32), axis=-1, keepdims=True)
    out = jax.lax.dot_general(probs.astype(dt), v, dims,
                              preferred_element_type=jnp.float32)
    return out * (1.0 / denom)


def mk_window(variant, g_block=25):
    from samcarriestheburden_tpu.kernels import attention as A

    def kern(qkv_ref, tcat_ref, o_ref, *, scale, ws, np_, hd):
        n = ws * ws
        inv = 1.0 / scale
        qkv = qkv_ref[:]
        q = qkv[:, :, :hd]
        k = qkv[:, :, hd:2 * hd]
        v = qkv[:, :, 2 * hd:3 * hd]
        dt = qkv.dtype
        g = q.shape[0]
        gcat = jax.lax.dot_general(q, tcat_ref[:], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        gs = gcat * inv
        row = jax.lax.broadcasted_iota(jnp.int32, (1, np_, 1), 1)
        p_of = jnp.minimum(row // ws, ws - 1)
        q_of = row % ws
        gh = gs[:, :, :128]
        gw = gs[:, :, 128:]
        b = 1
        while b < ws:
            gh = jnp.where((p_of & b) != 0,
                           pltpu.roll(gh, shift=128 - b, axis=2), gh)
            gw = jnp.where((q_of & b) != 0,
                           pltpu.roll(gw, shift=128 - b, axis=2), gw)
            b <<= 1
        relh = gh[:, :, :ws].astype(dt)
        relw = gw[:, :, :ws].astype(dt)
        key = jax.lax.broadcasted_iota(jnp.int32, (np_, ws), 0)
        ehT = (key // ws == ws - 1 - jax.lax.broadcasted_iota(
            jnp.int32, (np_, ws), 1))
        ewT = (key % ws == ws - 1 - jax.lax.broadcasted_iota(
            jnp.int32, (np_, ws), 1))
        ewT = jnp.logical_and(ewT, key < n)
        qcat = jnp.concatenate([q, relh, relw], axis=2)
        ecat = jnp.broadcast_to(
            jnp.concatenate([ehT.astype(dt), ewT.astype(dt)], axis=1)[None],
            (g, np_, 2 * ws))
        kcat = jnp.concatenate([k, ecat], axis=2)
        logits = jax.lax.dot_general(
            qcat, kcat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if np_ != n:
            dead = jax.lax.broadcasted_iota(jnp.int32, (1, 1, np_), 2) >= n
            logits = logits + jnp.where(dead, -1e30, 0.0)
        out = _softmax_av(logits, v, variant, (((2,), (1,)), ((0,), (0,))))
        o_ref[0] = out.astype(o_ref.dtype)

    p = A._headmajor_pad(HD)
    scale = HD ** -0.5

    def run(qkv, tcat):
        grid = (WB // g_block, HEADS)
        return pl.pallas_call(
            partial(kern, scale=scale, ws=WS, np_=NP, hd=HD),
            grid=grid,
            in_specs=[
                pl.BlockSpec((g_block, NP, p), lambda i, h: (i, 0, h)),
                pl.BlockSpec((HD, 256), lambda i, h: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, g_block, NP, HD),
                                   lambda i, h: (h, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((HEADS, WB, NP, HD), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv, tcat)

    return jax.jit(run)


def mk_global(variant, q_block=1024):
    from samcarriestheburden_tpu.kernels import attention as A

    kh = kw = 64

    def kern(qq_ref, kv_ref, tcat_ref, o_ref, *, scale, hd):
        n = kh * kw
        inv = 1.0 / scale
        q = qq_ref[0][:, :hd]
        kv = kv_ref[0]
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
        qcat = jnp.concatenate([q, relh, relw], axis=1)
        kcat = jnp.concatenate([k, ehT.astype(dt), ewT.astype(dt)], axis=1)
        logits = jax.lax.dot_general(
            qcat, kcat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        out = _softmax_av(logits, v, variant, (((1,), (0,)), ((), ())))
        o_ref[0, 0] = out.astype(o_ref.dtype)

    p = A._headmajor_pad(HD)
    scale = HD ** -0.5

    def run(qkv, tcat):
        grid = (GB, GN // q_block, HEADS)
        return pl.pallas_call(
            partial(kern, scale=scale, hd=HD),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, q_block, p), lambda b, i, h: (b, i, h)),
                pl.BlockSpec((1, GN, p), lambda b, i, h: (b, 0, h)),
                pl.BlockSpec((HD, 256), lambda b, i, h: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, q_block, HD),
                                   lambda b, i, h: (h, b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((HEADS, GB, GN, HD), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv, qkv, tcat)

    return jax.jit(run)


def main():
    which = sys.argv[1:] or ["win", "glob"]
    rng = np.random.default_rng(0)
    from samcarriestheburden_tpu.kernels import attention as A

    p = A._headmajor_pad(HD)
    results = {}
    if "win" in which:
        qkv = jnp.asarray(rng.standard_normal((WB, NP, HEADS * p)),
                          jnp.bfloat16)
        tcat = jnp.asarray(rng.standard_normal((HD, 256)) * 0.02, jnp.bfloat16)
        for variant in ("v1", "v2", "v3"):
            results[f"win_{variant}"] = _trace_run(
                f"win_{variant}", mk_window(variant), qkv, tcat)
        for gb in (50, 100):
            results[f"win_v3_g{gb}"] = _trace_run(
                f"win_v3_g{gb}", mk_window("v3", g_block=gb), qkv, tcat)
    if "glob" in which:
        qkv = jnp.asarray(rng.standard_normal((GB, GN, HEADS * p)),
                          jnp.bfloat16)
        tcat = jnp.asarray(rng.standard_normal((HD, 256)) * 0.02, jnp.bfloat16)
        for variant in ("v1", "v2", "v3"):
            results[f"glob_{variant}"] = _trace_run(
                f"glob_{variant}", mk_global(variant), qkv, tcat)
        results["glob_v3_q2048"] = _trace_run(
            "glob_v3_q2048", mk_global("v3", q_block=2048), qkv, tcat)

    print("\nsummary (pallas us/iter, batch-8 shapes):")
    for k, v in results.items():
        print(f"  {k:18s} {v:10.1f}")


if __name__ == "__main__":
    main()
