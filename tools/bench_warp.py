"""TPU microbench: augmentation warp methods at the reference train shapes.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_warp.py
"""
import sys
import time

import numpy as np


def time_it(fn, *args, iters=3, warmup=2, inner=4):
    import jax
    import jax.numpy as jnp

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


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    from samcarriestheburden_tpu.train.augment import warp_affine

    rng = np.random.default_rng(0)
    b, c, h, w = 16, 17, 384, 224
    x = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    y = (rng.random((b, c, h, w)) > 0.6).astype(np.float32)
    theta = (np.eye(2, 3)[None]
             + rng.standard_normal((b, 2, 3)) * 0.03).astype(np.float32)
    methods = sys.argv[1:] or ["matmul", "gather"]
    for m in methods:
        t = time_it(lambda xx, yy, th: warp_affine(xx, yy, th, method=m),
                    x, y, theta)
        print(f"warp[{m}]: {t*1e3:.2f} ms/step-batch", flush=True)


if __name__ == "__main__":
    main()
