"""A/B the EXPERIMENTAL int8 P·V path (round-4 VERDICT #6: the declined
idea gets traced numbers like every other candidate).

Measures fused_rel_attention_global3d at the ViT-H GLOBAL shape (n = 64²)
and at a WINDOW-sized shape (n = 14², same kernel at kh = kw = 14 — the
per-window P·V geometry) in three modes: bf16 baseline, int8 QK (shipped),
int8 QK + int8 P·V (candidate).  Run on the TPU:

    python tools/bench_int8pv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.kernels.attention import (
    fused_rel_attention_global3d, _headmajor_pad)


def bench(heads, hd, gh, gw, b, label):
    n = gh * gw
    p = _headmajor_pad(hd)
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, n, heads * p)), jnp.bfloat16)
    tcat = jnp.asarray(rng.standard_normal((hd, 256)) * 0.1, jnp.bfloat16)

    def timed(int8_qk, int8_pv):
        f = jax.jit(lambda q, t: fused_rel_attention_global3d(
            q, t, kh=gh, kw=gw, heads=heads, hd=hd,
            int8_qk=int8_qk, int8_pv=int8_pv))
        out = f(qkv, tcat)
        jax.block_until_ready(out)

        @jax.jit
        def chained(q, t):
            def body(_, acc):
                o = fused_rel_attention_global3d(
                    q + (acc * 1e-30).astype(q.dtype), t, kh=gh, kw=gw,
                    heads=heads, hd=hd, int8_qk=int8_qk, int8_pv=int8_pv)
                return jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

        for _ in range(2):
            float(chained(qkv, tcat))
        t0 = time.perf_counter()
        for _ in range(3):
            float(chained(qkv, tcat))
        dt = (time.perf_counter() - t0) / 24
        return dt, np.asarray(out[:, :, :8, :8], np.float32)

    t_fp, o_fp = timed(False, False)
    t_qk, o_qk = timed(True, False)
    t_pv, o_pv = timed(True, True)
    scale = np.abs(o_fp).max()
    print(f"{label} (n={n}, heads={heads}, b={b}):")
    print(f"  bf16            : {t_fp*1e3:7.3f} ms")
    print(f"  int8 QK         : {t_qk*1e3:7.3f} ms  ({t_fp/t_qk:.3f}x, "
          f"rel-err {np.abs(o_qk-o_fp).max()/scale:.4f})")
    print(f"  int8 QK + P.V   : {t_pv*1e3:7.3f} ms  ({t_fp/t_pv:.3f}x vs "
          f"bf16, {t_qk/t_pv:.3f}x vs int8QK, "
          f"rel-err {np.abs(o_pv-o_fp).max()/scale:.4f})")


if __name__ == "__main__":
    bench(heads=16, hd=80, gh=64, gw=64, b=2, label="ViT-H global layer")
    # window geometry: same kernel at 14x14 tokens, batched like the 25
    # windows x 2 imgs the serving path sees
    bench(heads=16, hd=80, gh=14, gw=14, b=50, label="ViT-H window-shape")
