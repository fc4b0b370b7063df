"""Where did the compact-window saving go?  Micro-bench the pieces at ViT-H
batch-32 serving shapes: int8 MLP at 160k vs 133k rows, the attention kernels
at flat vs compact window group shapes, and the partition/unpartition pair."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

E, M, HEADS, HD = 1280, 5120, 16, 80
B = 32
rng = np.random.default_rng(0)


def timeit(f, *args, inner=8, iters=3):
    @jax.jit
    def chained(*a):
        def body(_, acc):
            first = (a[0] + (acc * 1e-30).astype(a[0].dtype),) + a[1:]
            out = f(*first)
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(out))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    for _ in range(2):
        float(chained(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        float(chained(*args))
    return (time.perf_counter() - t0) / (3 * inner)


# ---- int8 MLP rows: 5000/img vs 4160/img -------------------------------
from samcarriestheburden_tpu.kernels.quant import (
    fused_ln_mlp_residual_int8, quantize_weight)

g = jnp.asarray(1 + rng.standard_normal(E) * 0.1, jnp.float32)
bb = jnp.asarray(rng.standard_normal(E) * 0.1, jnp.float32)
w1q, s1 = quantize_weight(jnp.asarray(rng.standard_normal((E, M)) * 0.03))
b1 = jnp.asarray(rng.standard_normal(M) * 0.1, jnp.float32)
w2q, s2 = quantize_weight(jnp.asarray(rng.standard_normal((M, E)) * 0.03))
b2 = jnp.asarray(rng.standard_normal(E) * 0.1, jnp.float32)
for rows in (B * 5000, B * 4160):
    x = jnp.asarray(rng.standard_normal((rows, E)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((rows, E)), jnp.bfloat16)
    t = timeit(lambda xx, aa: fused_ln_mlp_residual_int8(
        xx, g, bb, w1q, s1, b1, w2q, s2, b2, add=aa), x, a)
    print(f"int8 MLP rows={rows}: {t*1e3:.3f} ms", flush=True)

# ---- attention kernels: flat (800 windows @200) vs compact groups ------
from samcarriestheburden_tpu.kernels.attention import (
    _headmajor_pad, fused_rel_attention_window3d,
    fused_rel_attention_window_rect)

P = _headmajor_pad(HD)
tcat = jnp.asarray(rng.standard_normal((HD, 256)) * 0.1, jnp.bfloat16)
bkv = jnp.asarray(rng.standard_normal((HEADS, P)) * 0.1, jnp.bfloat16)

qkv_flat = jnp.asarray(rng.standard_normal((B * 25, 200, HEADS * P)),
                       jnp.bfloat16)
t = timeit(lambda q: fused_rel_attention_window3d(
    q, tcat, ws=14, heads=HEADS, hd=HD), qkv_flat)
print(f"flat window3d 800x200: {t*1e3:.3f} ms", flush=True)

qkv_int = jnp.asarray(rng.standard_normal((B * 16, 200, HEADS * P)),
                      jnp.bfloat16)
t_int = timeit(lambda q: fused_rel_attention_window3d(
    q, tcat, ws=14, heads=HEADS, hd=HD), qkv_int)
print(f"compact interior 512x200: {t_int*1e3:.3f} ms", flush=True)

tot = t_int
for rh, rw, cnt in ((14, 8, 4), (8, 14, 4), (8, 8, 1)):
    n = rh * rw
    np_ = -(-n // 8) * 8
    qkv_e = jnp.asarray(rng.standard_normal((B * cnt, np_, HEADS * P)),
                        jnp.bfloat16)
    t_e = timeit(lambda q: fused_rel_attention_window_rect(
        q, tcat, bkv, ws=14, rh=rh, rw=rw, heads=HEADS, hd=HD), qkv_e)
    tot += t_e
    print(f"compact rect {rh}x{rw} wb={B*cnt}: {t_e*1e3:.3f} ms", flush=True)
print(f"compact attention total: {tot*1e3:.3f} ms", flush=True)

# ---- partition / unpartition ------------------------------------------
from samcarriestheburden_tpu.models.image_encoder import (
    compact_window_groups, window_partition_compact,
    window_partition_flat, window_unpartition_compact,
    window_unpartition_flat)

x = jnp.asarray(rng.standard_normal((B, 64, 64, E)), jnp.bfloat16)
groups = compact_window_groups(64, 64, 14)

t = timeit(lambda xx: window_partition_flat(xx, 14)[0], x)
print(f"partition_flat: {t*1e3:.3f} ms", flush=True)
t = timeit(lambda xx: window_partition_compact(xx, 14, groups)[0], x)
print(f"partition_compact: {t*1e3:.3f} ms", flush=True)

flat, pad_hw = window_partition_flat(x, 14)
t = timeit(lambda ff: window_unpartition_flat(ff, 14, (70, 70), (64, 64)),
           flat)
print(f"unpartition_flat: {t*1e3:.3f} ms", flush=True)
stream, _ = window_partition_compact(x, 14, groups)
t = timeit(lambda ss: window_unpartition_compact(ss, 14, groups, B, (64, 64)),
           stream)
print(f"unpartition_compact: {t*1e3:.3f} ms", flush=True)

# ---- ln+qkv rows -------------------------------------------------------
from samcarriestheburden_tpu.kernels.quant import fused_ln_masked_linear_int8

wqh, sq = quantize_weight(jnp.asarray(rng.standard_normal((E, HEADS * P))
                                      * 0.03))
bq = jnp.asarray(rng.standard_normal(HEADS * P) * 0.1, jnp.float32)
for rows in (B * 5000, B * 4160):
    x2 = jnp.asarray(rng.standard_normal((rows, E)), jnp.bfloat16)
    m2 = jnp.ones((rows, 1), jnp.bfloat16)
    t = timeit(lambda xx: fused_ln_masked_linear_int8(
        xx, m2, g, bb, wqh, sq, bq), x2)
    print(f"int8 ln+qkv rows={rows}: {t*1e3:.3f} ms", flush=True)
