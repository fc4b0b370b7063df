"""Micro-experiments: is an int8 Mosaic/XLA dot actually 2x bf16 on this v5e?

Times candidate formulations of the encoder MLP block at ViT-H batch-4
windowed shapes (T=19600, E=1280, M=5120) and prints device self-times from
a jax.profiler trace (the only trustworthy clock over the axon tunnel — see
memory/axon-tpu-quirks.md).

Usage: python tools/exp_int8.py [exp ...]   (default: all)
"""

from __future__ import annotations

import sys
import tempfile
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

T, E, M = 19600, 1280, 5120
ITERS = 10


def _trace_run(name, fn, *args):
    # warmup/compile
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{name}] compiled+first in {time.perf_counter()-t0:.1f}s sum={s:.3e}",
          flush=True)
    tmp = tempfile.mkdtemp(prefix=f"tr_{name}_")
    with jax.profiler.trace(tmp):
        acc = 0.0
        for _ in range(ITERS):
            acc += float(jnp.sum(fn(*args).astype(jnp.float32)))
    from parse_trace import find_xplane
    import json
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([find_xplane(tmp)], "framework_op_stats", {})
    tables = json.loads(data)
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in tables[0]["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"]
    dev.sort(key=lambda r: -r["total_self_time"])
    total = sum(r["total_self_time"] for r in dev)
    print(f"--- {name}: device total {total/ITERS:.1f} us/iter ---")
    for r in dev[:6]:
        print(f"  {r['total_self_time']/ITERS:9.1f} us  {r['occurrences']:4.0f}x  "
              f"{r['operation'][:80]}")
    return total / ITERS


def main():
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    xb = x32.astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((E, M)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((M, E)) * 0.02, jnp.float32)
    g = jnp.ones((E,), jnp.float32)
    b = jnp.zeros((E,), jnp.float32)
    b1 = jnp.zeros((M,), jnp.float32)
    b2 = jnp.zeros((E,), jnp.float32)

    from samcarriestheburden_tpu.kernels.quant import quantize_weight
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    w1q, s1, w2q, s2 = jax.device_put((w1q, s1, w2q, s2))
    xq = jnp.clip(jnp.round(x32 * 10), -127, 127).astype(jnp.int8)

    exps = {}

    # 1/2: raw XLA dots — is the hardware/compiler int8 path 2x?
    exps["xla_dot_bf16"] = (jax.jit(lambda a, w: jax.lax.dot_general(
        a, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)), (xb, w1))
    exps["xla_dot_int8"] = (jax.jit(lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)), (xq, w1q))

    # 3/4: pallas dot-only kernels, t-blocked like the MLP kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dot_kernel(x_ref, w_ref, o_ref, *, out_dt):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dt)

    def pallas_dot(x, w, out_dt, t_block=256):
        grid = (pl.cdiv(T, t_block),)
        return pl.pallas_call(
            partial(dot_kernel, out_dt=out_dt),
            grid=grid,
            in_specs=[pl.BlockSpec((t_block, E), lambda i: (i, 0)),
                      pl.BlockSpec((E, M), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((t_block, M), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((T, M), out_dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    exps["pallas_dot_bf16"] = (jax.jit(lambda a, w: pallas_dot(
        a, w.astype(jnp.bfloat16), jnp.float32)), (xb, w1))
    exps["pallas_dot_int8"] = (jax.jit(lambda a, w: pallas_dot(
        a, w, jnp.int32).astype(jnp.float32)), (xq, w1q))

    # 5/6: the real fused MLP kernels (prequantized weights for int8)
    from samcarriestheburden_tpu.kernels.mlp import fused_ln_mlp_residual
    from samcarriestheburden_tpu.kernels.quant import fused_ln_mlp_residual_int8

    exps["mlp_bf16"] = (jax.jit(lambda a: fused_ln_mlp_residual(
        a, g, b, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2)),
        (xb,))
    exps["mlp_int8_preq"] = (jax.jit(lambda a: fused_ln_mlp_residual_int8(
        a, g, b, w1q, s1, b1, w2q, s2, b2)), (xb,))

    # chunked int8 MLP: split M into chunks so VPU quant work on chunk j-1
    # can overlap the MXU dot of chunk j (ILP), and drop the redundant clip
    from samcarriestheburden_tpu.kernels.mlp import _erf

    def _rq(xv):
        s = jnp.maximum(jnp.max(jnp.abs(xv), axis=-1, keepdims=True),
                        1e-12) / 127.0
        return jnp.round(xv / s).astype(jnp.int8), s

    def mk_chunked(n_chunks, t_block=256):
        def kern(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                 w2_ref, s2_ref, b2_ref, o_ref):
            xf = x_ref[:].astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
            xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
            xq, sx = _rq(xn)
            ch = M // n_chunks
            acc = jnp.zeros((xf.shape[0], E), jnp.float32)
            for j in range(n_chunks):
                h = jax.lax.dot_general(
                    xq, w1_ref[:, j * ch:(j + 1) * ch],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                h = h * (sx * s1_ref[0, j * ch:(j + 1) * ch]) \
                    + b1_ref[0, j * ch:(j + 1) * ch].astype(jnp.float32)
                h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
                hq, sh = _rq(h)
                acc = acc + jax.lax.dot_general(
                    hq, w2_ref[j * ch:(j + 1) * ch, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32) \
                    * (sh * s2_ref[0])
            o_ref[:] = (xf + acc + b2_ref[0].astype(jnp.float32)
                        ).astype(o_ref.dtype)

        def run(x):
            grid = (pl.cdiv(T, t_block),)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pl.BlockSpec((t_block, E), lambda i: (i, 0))] + [
                    pl.BlockSpec(s, lambda i: (0, 0)) for s in
                    [(1, E), (1, E), (E, M), (1, M), (1, M),
                     (M, E), (1, E), (1, E)]],
                out_specs=pl.BlockSpec((t_block, E), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((T, E), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, g.reshape(1, -1), b.reshape(1, -1), w1q, s1, b1.reshape(1, -1),
              w2q, s2, b2.reshape(1, -1))
        return jax.jit(run)

    exps["mlp_int8_chunk2"] = (mk_chunked(2), (xb,))
    exps["mlp_int8_chunk4"] = (mk_chunked(4), (xb,))
    exps["mlp_int8_chunk4_t512"] = (mk_chunked(4, t_block=512), (xb,))
    exps["mlp_int8_chunk8"] = (mk_chunked(8), (xb,))

    # diagnostics: where do the ~570us of serial VPU work come from?
    # single-chunk kernel with (a) relu / (b) sigmoid-gelu / (c) fixed h
    # scale (no per-row reduce+div) / (d) erf baseline without clip
    def mk_diag(act="erf", fixed_hscale=False, t_block=256):
        def kern(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                 w2_ref, s2_ref, b2_ref, o_ref):
            xf = x_ref[:].astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
            xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
            xq, sx = _rq(xn)
            h = jax.lax.dot_general(
                xq, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            h = h * (sx * s1_ref[0]) + b1_ref[0].astype(jnp.float32)
            if act == "erf":
                h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
            elif act == "sigmoid":
                h = h * jax.nn.sigmoid(1.702 * h)
            elif act == "relu":
                h = jnp.maximum(h, 0.0)
            elif act == "poly":
                u = h * h
                p = 1.0962050526e-08
                for c in (-9.3423034307e-07, 3.3436889582e-05,
                          -6.5934551371e-04, 7.9518464564e-03,
                          -6.2628257803e-02, 3.9645120080e-01):
                    p = p * u + c
                h = h * jnp.clip(0.5 + h * p, 0.0, 1.0)
            if fixed_hscale:
                hq = jnp.round(h * 8.0).astype(jnp.int8)  # bogus numerics
                sh = jnp.full_like(sx, 1.0 / 8.0)
            else:
                hq, sh = _rq(h)
            y = jax.lax.dot_general(
                hq, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            o_ref[:] = (xf + y * (sh * s2_ref[0])
                        + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)

        def run(x):
            grid = (pl.cdiv(T, t_block),)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pl.BlockSpec((t_block, E), lambda i: (i, 0))] + [
                    pl.BlockSpec(s, lambda i: (0, 0)) for s in
                    [(1, E), (1, E), (E, M), (1, M), (1, M),
                     (M, E), (1, E), (1, E)]],
                out_specs=pl.BlockSpec((t_block, E), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((T, E), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, g.reshape(1, -1), b.reshape(1, -1), w1q, s1, b1.reshape(1, -1),
              w2q, s2, b2.reshape(1, -1))
        return jax.jit(run)

    exps["diag_poly"] = (mk_diag("poly"), (xb,))
    exps["diag_poly_t512"] = (mk_diag("poly", t_block=512), (xb,))
    exps["diag_erf"] = (mk_diag("erf"), (xb,))
    exps["diag_sigmoid"] = (mk_diag("sigmoid"), (xb,))
    exps["diag_relu"] = (mk_diag("relu"), (xb,))
    exps["diag_erf_fixedscale"] = (mk_diag("erf", fixed_hscale=True), (xb,))
    exps["diag_relu_fixedscale"] = (mk_diag("relu", fixed_hscale=True), (xb,))

    names = sys.argv[1:] or list(exps)
    results = {}
    for n in names:
        fn, args = exps[n]
        results[n] = _trace_run(n, fn, *args)
    print("\nsummary (us/iter):")
    for n, v in results.items():
        print(f"  {n:20s} {v:9.1f}")


if __name__ == "__main__":
    main()
