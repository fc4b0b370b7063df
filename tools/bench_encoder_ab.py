"""A/B the serving encoder on the real chip: --compact {on,off} etc.

python tools/bench_encoder_ab.py --batch 32 --quantize int8 --compact on
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--quantize", default="int8", choices=["int8", "none"])
    ap.add_argument("--compact", default="on", choices=["on", "off"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.engine.embeddings import make_serving_encoder
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = getattr(_config, f"sam_{args.model}_config")()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    model = SamModel(cfg=cfg, params=params)
    size = model.img_size
    rng = np.random.default_rng(0)

    quant = None if args.quantize == "none" else args.quantize
    encode, eparams = make_serving_encoder(
        model, jnp.bfloat16, quantize=quant,
        compact_windows=(args.compact == "on"))
    imgs = jnp.asarray(rng.integers(0, 255, (args.batch, 3, size, size)),
                       jnp.uint8)
    sizes = jnp.tile(jnp.asarray([[size, int(size * 0.7)]], jnp.int32),
                     (args.batch, 1))

    @jax.jit
    def chained(a, b, p):
        def body(_, acc):
            first = a + (acc * 1e-30).astype(a.dtype)  # dependency chain
            out = encode(p, first, b)
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, args.inner, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(chained(imgs, sizes, eparams))
    print(f"compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(2):
        float(chained(imgs, sizes, eparams))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(chained(imgs, sizes, eparams))
    dt = (time.perf_counter() - t0) / (args.iters * args.inner)
    print(f"model={args.model} batch={args.batch} quantize={quant} "
          f"compact={args.compact}: {dt / args.batch * 1e3:.2f} ms/img "
          f"({args.batch / dt:.2f} img/s)")


if __name__ == "__main__":
    main()
