"""Component-level ViT-H encoder profiling on one chip (round-2 perf work).

Times, at production shapes (batch B, bf16):
* full encoder: {persistent,repartition} x {pallas,xla} attention, batch sweep
* per-component micro-benches: patch embed, windowed/global attention kernel,
  qkv/proj/mlp matmuls (both the 4096-token flat and 4900-token padded-window
  layouts), LayerNorm, neck, rel-projection einsums.

Usage: python tools/profile_encoder.py [--batch 4] [--full] [--sweep]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timer():
    import jax
    import jax.numpy as jnp

    def time_fn(fn, *args, iters=3, inner=8, warmup=2):
        @jax.jit
        def chained(*a):
            def body(_, acc):
                first = a[0] + (acc * 1e-30).astype(a[0].dtype)
                out = fn(first, *a[1:])
                return sum(jnp.sum(o.astype(jnp.float32))
                           for o in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

        for _ in range(warmup):
            float(chained(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(*args))
        return (time.perf_counter() - t0) / (iters * inner)

    return time_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--full", action="store_true", help="full-encoder variants")
    p.add_argument("--sweep", action="store_true", help="batch sweep")
    p.add_argument("--components", action="store_true")
    args = p.parse_args()
    if not (args.full or args.sweep or args.components):
        args.full = args.components = True

    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.kernels.attention import (
        attention_apply_pallas, fused_rel_attention)
    from samcarriestheburden_tpu.models import image_encoder
    from samcarriestheburden_tpu.models.common import layer_norm, linear, mlp_block
    from samcarriestheburden_tpu.models.sam import init as sam_init

    time_fn = _timer()
    B = args.batch
    cfg = _config.sam_vit_h_config().image_encoder
    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda k: image_encoder.init(k, cfg),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    E, HEADS, HD = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    G = cfg.grid_size          # 64
    WS = cfg.window_size       # 14
    NW = (-(-G // WS)) ** 2    # 25 windows
    NTOK, NTOKP = B * G * G, B * NW * WS * WS

    def r(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    if args.full:
        imgs = r((B, 3, 1024, 1024), jnp.float32)
        for pw in (True, False):
            for name, impl in (("pallas", attention_apply_pallas),
                               ("xla", image_encoder.attention_apply)):
                t = time_fn(lambda x, pr: image_encoder.apply(
                    pr, cfg, x, dtype=jnp.bfloat16, attention_impl=impl,
                    persistent_windows=pw), imgs, params, inner=2, iters=3)
                print(f"full persistent={pw} attn={name}: "
                      f"{1e3 * t / B:.2f} ms/img ({B / t:.2f} img/s)")

    if args.sweep:
        for b in (1, 2, 4, 8, 16):
            imgs = r((b, 3, 1024, 1024), jnp.float32)
            t = time_fn(lambda x, pr: image_encoder.apply(
                pr, cfg, x, dtype=jnp.bfloat16,
                attention_impl=attention_apply_pallas), imgs, params,
                inner=2, iters=3)
            print(f"batch {b}: {1e3 * t / b:.2f} ms/img ({b / t:.2f} img/s)")

    if args.components:
        blk = params["blocks"][0]
        gblk = params["blocks"][7]

        x_img = r((B, 3, 1024, 1024), jnp.float32)
        t = time_fn(lambda x, pr: image_encoder.apply(
            {**pr, "blocks": []}, cfg.replace(depth=0, global_attn_indexes=()),
            x, dtype=jnp.bfloat16), x_img, params, inner=4)
        print(f"patch+pos+neck only: {1e3 * t / B:.2f} ms/img")

        # token layouts
        xw = r((B * NW, WS, WS, E))       # padded-window layout (4900 tok/img)
        xf = r((B, G, G, E))              # flat layout (4096 tok/img)

        for name, xx in (("window-layout", xw), ("flat-layout", xf)):
            t = time_fn(lambda a, w: mlp_block(w, a), xx, blk["mlp"], inner=8)
            print(f"mlp {name}: {1e3 * t / B:.3f} ms/img "
                  f"({2 * 2 * xx.size // E * E * 4 * E / t / 1e12 / B:.0f} TF/s-ish)")
            t = time_fn(lambda a, w: linear(w, a), xx, blk["attn"]["qkv"], inner=8)
            print(f"qkv {name}: {1e3 * t / B:.3f} ms/img")
            t = time_fn(lambda a, w: linear(w, a), xx, blk["attn"]["proj"], inner=8)
            print(f"proj {name}: {1e3 * t / B:.3f} ms/img")
            t = time_fn(lambda a, w: layer_norm(w, a), xx, blk["norm1"], inner=8)
            print(f"LN {name}: {1e3 * t / B:.3f} ms/img")

        # attention cores (kernel only, incl. in-kernel bias build)
        g_win = B * NW * HEADS
        q = r((g_win, WS * WS, HD))
        rh = r((g_win, WS * WS, WS))
        t = time_fn(lambda a, b_, c, d, e: fused_rel_attention(
            a, b_, c, d, e, kh=WS, kw=WS), q, q, q, rh, rh, inner=8)
        print(f"window attn kernel (28x): {1e3 * t / B:.3f} ms/img")

        g_glob = B * HEADS
        qg = r((g_glob, G * G, HD))
        rhg = r((g_glob, G * G, G))
        t = time_fn(lambda a, b_, c, d, e: fused_rel_attention(
            a, b_, c, d, e, kh=G, kw=G), qg, qg, qg, rhg, rhg, inner=4)
        print(f"global attn kernel (4x): {1e3 * t / B:.3f} ms/img")

        # rel-projection einsums (outside-kernel part of pallas path)
        rq = q.reshape(g_win, WS, WS, HD)
        table = r((WS, WS, HD))
        t = time_fn(lambda a, tb: jnp.einsum(
            "bhwc,hkc->bhwk", a, tb, preferred_element_type=jnp.float32),
            rq, table, inner=8)
        print(f"rel-proj einsum windowed (x2 x28): {1e3 * t / B:.3f} ms/img")
        rqg = qg.reshape(g_glob, G, G, HD)
        tableg = r((G, G, HD))
        t = time_fn(lambda a, tb: jnp.einsum(
            "bhwc,hkc->bhwk", a, tb, preferred_element_type=jnp.float32),
            rqg, tableg, inner=8)
        print(f"rel-proj einsum global (x2 x4): {1e3 * t / B:.3f} ms/img")

        # one full windowed + global block through each path
        pad_valid = jnp.ones((B * NW, WS, WS, 1), jnp.bfloat16)
        t = time_fn(lambda a, w: image_encoder._block_apply_windowed(
            w, a, pad_valid, cfg, attention_apply_pallas), xw, blk, inner=8)
        print(f"windowed block pallas (x28): {1e3 * t / B:.3f} ms/img")
        t = time_fn(lambda a, w: image_encoder.block_apply(
            w, a, cfg, 0, attention_apply_pallas), xf, gblk, inner=4)
        print(f"global block pallas (x4): {1e3 * t / B:.3f} ms/img")


if __name__ == "__main__":
    main()
