import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from samcarriestheburden_tpu.kernels.attention import (
    fused_rel_attention_global3d, _headmajor_pad)

heads, hd, gh, gw, b = 16, 80, 64, 64, 2
n = gh * gw
p = _headmajor_pad(hd)
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((b, n, heads * p)), jnp.bfloat16)
tcat = jnp.asarray(rng.standard_normal((hd, 256)) * 0.1, jnp.bfloat16)

def timed(int8_qk):
    f = jax.jit(lambda q, t: fused_rel_attention_global3d(
        q, t, kh=gh, kw=gw, heads=heads, hd=hd, int8_qk=int8_qk))
    out = f(qkv, tcat)
    jax.block_until_ready(out)
    # chain to amortize tunnel RTT
    @jax.jit
    def chained(q, t):
        def body(_, acc):
            o = fused_rel_attention_global3d(
                q + (acc * 1e-30).astype(q.dtype), t, kh=gh, kw=gw,
                heads=heads, hd=hd, int8_qk=int8_qk)
            return jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, 8, body, jnp.float32(0))
    for _ in range(2):
        float(chained(qkv, tcat))
    t0 = time.perf_counter()
    for _ in range(3):
        float(chained(qkv, tcat))
    dt = (time.perf_counter() - t0) / 24
    return dt, np.asarray(out[:, :, :8, :8], np.float32)

t_fp, o_fp = timed(False)
t_i8, o_i8 = timed(True)
err = np.abs(o_fp - o_i8).max()
print(f"bf16: {t_fp*1e3:.3f} ms  int8_qk: {t_i8*1e3:.3f} ms  "
      f"speedup {t_fp/t_i8:.3f}x  sample-max-abs-diff {err:.4f}")
