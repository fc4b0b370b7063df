"""Can Mosaic lower (w, 196, E) x (E, M) dots / in-kernel leading-dim
reshapes?  Times candidates for the 3-D windowed pipeline."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tools")

WB, N, E, M = 100, 196, 1280, 5120
rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((WB, N, E)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((E, M)) * 0.02, jnp.bfloat16)


def timeit(name, fn, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))
        compile_t = time.perf_counter() - t0
        import tempfile

        tmp = tempfile.mkdtemp(prefix=f"tr3d_{name}_")
        with jax.profiler.trace(tmp):
            for _ in range(6):
                float(jnp.sum(fn(*args).astype(jnp.float32)))
        from parse_trace import find_xplane
        import json
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data([find_xplane(tmp)],
                                          "framework_op_stats", {})
        tables = json.loads(data)
        cols = [c["id"] for c in tables[0]["cols"]]
        rows = [dict(zip(cols, [c["v"] for c in r["c"]]))
                for r in tables[0]["rows"]]
        t = sum(r["total_self_time"] for r in rows
                if r["host_or_device"] == "Device"
                and "pallas" in r["operation"]) / 6
        print(f"[{name}] OK kernel {t:.0f} us/iter (compile {compile_t:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"[{name}] FAIL {repr(e)[:300]}", flush=True)


# 1: 3-D x 2-D dot in kernel
def k_dot3d(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def dot3d(x):
    return pl.pallas_call(
        k_dot3d,
        grid=(WB // 4,),
        in_specs=[pl.BlockSpec((4, N, E), lambda i: (i, 0, 0)),
                  pl.BlockSpec((E, M), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((4, N, M), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((WB, N, M), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, w)


# 2: in-kernel leading-dim merge reshape then 2-D dot
def k_reshape(x_ref, w_ref, o_ref):
    xx = x_ref[:].reshape(4 * N, E)
    y = jax.lax.dot_general(xx, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(4, N, M).astype(o_ref.dtype)


def dotreshape(x):
    return pl.pallas_call(
        k_reshape,
        grid=(WB // 4,),
        in_specs=[pl.BlockSpec((4, N, E), lambda i: (i, 0, 0)),
                  pl.BlockSpec((E, M), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((4, N, M), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((WB, N, M), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, w)


# 3: reference 2-D (aligned rows irrelevant here, just rate baseline)
def k_2d(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def dot2d(x2):
    return pl.pallas_call(
        k_2d,
        grid=(25,),
        in_specs=[pl.BlockSpec((784, E), lambda i: (i, 0)),
                  pl.BlockSpec((E, M), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((784, M), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((WB * N, M), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x2, w)


if __name__ == "__main__":
    which = sys.argv[1:] or ["dot3d", "dotreshape", "dot2d"]
    if "dot3d" in which:
        timeit("dot3d", jax.jit(dot3d), x3)
    if "dotreshape" in which:
        timeit("dotreshape", jax.jit(dotreshape), x3)
    if "dot2d" in which:
        timeit("dot2d", jax.jit(dot2d), x3.reshape(WB * N, E))
