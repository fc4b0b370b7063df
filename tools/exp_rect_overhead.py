"""Isolate the rect kernel's inefficiency: body overhead vs launch overhead
vs shape effects."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

HEADS, HD = 16, 80
from samcarriestheburden_tpu.kernels.attention import (
    _headmajor_pad, fused_rel_attention_window3d,
    fused_rel_attention_window_rect)

P = _headmajor_pad(HD)
rng = np.random.default_rng(0)
tcat = jnp.asarray(rng.standard_normal((HD, 256)) * 0.1, jnp.bfloat16)
bkv = jnp.asarray(rng.standard_normal((HEADS, P)) * 0.1, jnp.bfloat16)


def timeit(f, *args, inner=8):
    @jax.jit
    def chained(*a):
        def body(_, acc):
            first = (a[0] + (acc * 1e-30).astype(a[0].dtype),) + a[1:]
            out = f(*first)
            return jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))
    for _ in range(2):
        float(chained(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        float(chained(*args))
    return (time.perf_counter() - t0) / (3 * inner)


# same shape, rect body with rh=rw=ws (pad group empty) vs window3d body
q512 = jnp.asarray(rng.standard_normal((512, 200, HEADS * P)), jnp.bfloat16)
t3d = timeit(lambda q: fused_rel_attention_window3d(
    q, tcat, ws=14, heads=HEADS, hd=HD), q512)
print(f"window3d 512x200: {t3d*1e3:.3f} ms", flush=True)
trect = timeit(lambda q: fused_rel_attention_window_rect(
    q, tcat, bkv, ws=14, rh=14, rw=14, heads=HEADS, hd=HD), q512)
print(f"rect(14,14) 512x200 (same math + empty pad group): "
      f"{trect*1e3:.3f} ms", flush=True)

# rect at edge shape with bigger g_block (fewer programs)
q128 = jnp.asarray(rng.standard_normal((128, 112, HEADS * P)), jnp.bfloat16)
for gb in (16, 32, 64, 128):
    t = timeit(lambda q, gb=gb: fused_rel_attention_window_rect(
        q, tcat, bkv, ws=14, rh=14, rw=8, heads=HEADS, hd=HD, g_block=gb),
        q128)
    print(f"rect(14,8) 128x112 g_block={gb}: {t*1e3:.3f} ms", flush=True)

# window3d on the same 128x112 shape is impossible (needs ws^2 slots) — but
# measure an equivalent-token window3d for scale: 72 windows of 200
q72 = jnp.asarray(rng.standard_normal((72, 200, HEADS * P)), jnp.bfloat16)
t = timeit(lambda q: fused_rel_attention_window3d(
    q, tcat, ws=14, heads=HEADS, hd=HD), q72)
print(f"window3d 72x200 (same token count as 128x112): {t*1e3:.3f} ms",
      flush=True)

# corner group with one program
q32 = jnp.asarray(rng.standard_normal((32, 64, HEADS * P)), jnp.bfloat16)
for gb in (16, 32):
    t = timeit(lambda q, gb=gb: fused_rel_attention_window_rect(
        q, tcat, bkv, ws=14, rh=8, rw=8, heads=HEADS, hd=HD, g_block=gb), q32)
    print(f"rect(8,8) 32x64 g_block={gb}: {t*1e3:.3f} ms", flush=True)
