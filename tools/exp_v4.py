"""Time the v4 flat-window encoder path vs v3 at ViT-H shapes (TPU)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.models import image_encoder
    from samcarriestheburden_tpu.models.quantize import \
        prequantize_image_encoder

    which = sys.argv[1:] or ["bf16"]
    B = int(next((a[2:] for a in which if a.startswith("b=")), 4))
    which = [a for a in which if not a.startswith("b=")]
    cfg = _config.sam_vit_h_config().image_encoder
    shapes = jax.eval_shape(lambda k: image_encoder.init(k, cfg),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((B, 3, 1024, 1024)), jnp.float32)

    def time_fn(fn, *args, iters=3, inner=2, warmup=2):
        @jax.jit
        def chained(*a):
            def body(_, acc):
                first = a[0] + (acc * 1e-30).astype(a[0].dtype)
                out = fn(first, *a[1:])
                return jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

        for _ in range(warmup):
            float(chained(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(*args))
        return (time.perf_counter() - t0) / (iters * inner)

    if "bf16" in which:
        t = time_fn(lambda x, pr: image_encoder.apply(
            pr, cfg, x, dtype=jnp.bfloat16, fused_mlp=True, fused_qkv=True),
            imgs, params)
        print(f"v4 bf16: {1e3 * t / B:.2f} ms/img ({B / t:.2f} img/s)",
              flush=True)
    if "int8" in which:
        pq = prequantize_image_encoder(params, cfg)
        t = time_fn(lambda x, pr: image_encoder.apply(
            pr, cfg, x, dtype=jnp.bfloat16, fused_mlp=True, fused_qkv=True,
            quantize="int8"), imgs, pq)
        print(f"v4 int8: {1e3 * t / B:.2f} ms/img ({B / t:.2f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
