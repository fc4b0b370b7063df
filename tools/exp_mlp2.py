"""Micro-experiments round 2 for the int8 MLP kernel.

Prior sweep (tools/exp_int8.py, /tmp/exp_diag.log): poly+t512 = 1726 us vs
1372 us two-dot floor at (T=19600, E=1280, M=5120); relu+fixed-scale = 1429,
so ~300 us is activation + per-row quant.  The row quant's elementwise
``x / s`` is a full-width VPU divide — multiplying by the precomputed
reciprocal ``127/amax`` does one divide per ROW instead.  Chunking (M split,
per-chunk quant) was only tried with erf at t256; retry on top of poly+t512.

Usage: python tools/exp_mlp2.py
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

T, E, M = 19600, 1280, 5120
ITERS = 10

_PHI_POLY = (1.0962050526e-08, -9.3423034307e-07, 3.3436889582e-05,
             -6.5934551371e-04, 7.9518464564e-03, -6.2628257803e-02,
             3.9645120080e-01)


def _gelu_poly(h):
    u = h * h
    p = _PHI_POLY[0]
    for c in _PHI_POLY[1:]:
        p = p * u + c
    return h * jnp.clip(0.5 + h * p, 0.0, 1.0)


def _rq_div(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.round(x / s).astype(jnp.int8), s


def _rq_recip(x):
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12)
    r = 127.0 / amax
    return jnp.round(x * r).astype(jnp.int8), amax * (1.0 / 127.0)


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


def mk(n_chunks=1, t_block=512, rq=_rq_recip):
    def kern(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
             w2_ref, s2_ref, b2_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        xq, sx = rq(xn)
        ch = M // n_chunks
        acc = jnp.zeros((xf.shape[0], E), jnp.float32)
        for j in range(n_chunks):
            lo, hi = j * ch, (j + 1) * ch
            h = jax.lax.dot_general(
                xq, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            h = h * (sx * s1_ref[0, lo:hi]) + b1_ref[0, lo:hi].astype(jnp.float32)
            h = _gelu_poly(h)
            hq, sh = rq(h)
            acc = acc + jax.lax.dot_general(
                hq, w2_ref[lo:hi, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) \
                * (sh * s2_ref[0])
        o_ref[:] = (xf + acc + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)

    def run(x, g, b, w1q, s1, b1, w2q, s2, b2):
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


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, E)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((E, M)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((M, E)) * 0.02, jnp.float32)
    g = jnp.ones((E,), jnp.float32)
    b = jnp.zeros((E,), jnp.float32)
    b1 = jnp.zeros((M,), jnp.float32)
    b2 = jnp.zeros((E,), jnp.float32)

    from samcarriestheburden_tpu.kernels.quant import quantize_weight
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    args = (x, g, b, w1q, s1, b1, w2q, s2, b2)

    results = {}
    results["div_c1_t512"] = _trace_run("div_c1_t512", mk(rq=_rq_div), *args)
    results["recip_c1_t512"] = _trace_run("recip_c1_t512", mk(), *args)
    results["recip_c2_t512"] = _trace_run("recip_c2_t512", mk(n_chunks=2), *args)
    results["recip_c4_t512"] = _trace_run("recip_c4_t512", mk(n_chunks=4), *args)
    results["recip_c4_t1024"] = _trace_run("recip_c4_t1024",
                                           mk(n_chunks=4, t_block=1024), *args)

    print("\nsummary (pallas us/iter; two-dot floor 1372):")
    for k, v in results.items():
        print(f"  {k:16s} {v:10.1f}")


if __name__ == "__main__":
    main()
