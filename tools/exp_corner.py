import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from samcarriestheburden_tpu.kernels.attention import (
    _headmajor_pad, fused_rel_attention_window_rect,
    fused_rel_attention_window3d)
HEADS, HD = 16, 80
P = _headmajor_pad(HD)
rng = np.random.default_rng(0)
tcat = jnp.asarray(rng.standard_normal((HD, 256)) * 0.1, jnp.bfloat16)
bkv = jnp.asarray(rng.standard_normal((HEADS, P)) * 0.1, jnp.bfloat16)

def timeit(f, *args, inner=8):
    @jax.jit
    def chained(*a):
        def body(_, acc):
            first = (a[0] + (acc * 1e-30).astype(a[0].dtype),) + a[1:]
            return jnp.sum(f(*first).astype(jnp.float32))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))
    for _ in range(2):
        float(chained(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        float(chained(*args))
    return (time.perf_counter() - t0) / (3 * inner)

for wb, gb in ((288, 32), (288, 96), (1024, 32)):
    q = jnp.asarray(rng.standard_normal((wb, 112, HEADS * P)), jnp.bfloat16)
    t = timeit(lambda qq: fused_rel_attention_window_rect(
        qq, tcat, bkv, ws=14, rh=14, rw=8, heads=HEADS, hd=HD, g_block=gb), q)
    print(f"rect(14,8) wb={wb} gb={gb}: {t*1e3:.3f} ms "
          f"({t/wb*1e6:.1f} us/window)", flush=True)
# window3d per-window reference at scale
q = jnp.asarray(rng.standard_normal((1024, 200, HEADS * P)), jnp.bfloat16)
t = timeit(lambda qq: fused_rel_attention_window3d(
    qq, tcat, ws=14, heads=HEADS, hd=HD), q)
print(f"window3d wb=1024: {t*1e3:.3f} ms ({t/1024*1e6:.1f} us/window)",
      flush=True)
