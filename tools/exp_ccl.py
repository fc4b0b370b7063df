"""Experiment: XLA batched CCL propagation vs the VMEM-resident Pallas kernel.

Times ONLY the label-propagation stage (`connected_components` method='pool'
vs `connected_components_pallas`) at the production enhance shapes
(batch x 17 classes x 384 x 224, blob-ish masks) and asserts the labels are
identical.  This is the measurement behind the "propagation 6.1 -> 1.55
ms/img (3.96x on v5e)" claim in BENCHMARKS.md and ops/ccl.py: the batched
XLA while-loop writes the whole (maps, H, W) stack through HBM every
iteration and runs every map to the LAST map's convergence, while the Pallas
kernel keeps each map in VMEM and exits at its own fixpoint.

Usage: python tools/exp_ccl.py [--batch 8] [--iters 3]
Numbers vary +-10-20% day-to-day over the axon tunnel; compare ratios, not
absolutes.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_masks(batch: int, classes: int, hw: tuple[int, int]) -> np.ndarray:
    """Per-slot distinct multi-blob masks (the bench's enhance inputs)."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[: hw[0], : hw[1]]
    m = np.zeros((batch, classes) + hw, np.float32)
    for i in range(batch):
        for c in range(classes):
            for _ in range(3):  # a main blob + specks, like bone prob-masks
                cy = rng.uniform(0.15, 0.85) * hw[0]
                cx = rng.uniform(0.15, 0.85) * hw[1]
                r = rng.uniform(6, 40)
                m[i, c] += ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r)
    return (m > 0).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu.config import N_CLASSES, UNET_INPUT_HW
    from samcarriestheburden_tpu.ops.ccl import (connected_components,
                                                connected_components_pallas)

    hw = tuple(UNET_INPUT_HW)
    num_iter = hw[0] * hw[1]  # the wrapper's to-convergence bound
    masks = jnp.asarray(make_masks(args.batch, N_CLASSES, hw))

    pool = jax.jit(lambda m: connected_components(m, num_iter))
    pal = jax.jit(lambda m: connected_components_pallas(m, num_iter))

    lp = np.asarray(pool(masks))
    la = np.asarray(pal(masks))
    np.testing.assert_array_equal(la, lp)
    print(f"labels identical over {args.batch}x{N_CLASSES} maps {hw}")

    # Chain 8 executions inside one jit through a data dependency and fetch
    # one scalar: the only reliable timing over the tunnel (~28.5 ms RTT,
    # block_until_ready returns early there — see bench.py / memory notes).
    inner = 8
    for name, fn in [("xla pool ", pool), ("pallas   ", pal)]:

        @jax.jit
        def chained(m, fn=fn):
            def body(_, acc):
                first = m + (acc * 1e-30).astype(m.dtype)
                return jnp.sum(fn(first).astype(jnp.float32))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

        float(chained(masks)); float(chained(masks))  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(chained(masks))
        dt = (time.perf_counter() - t0) / args.iters / inner
        print(f"{name}: {dt * 1e3:8.2f} ms/call = "
              f"{dt * 1e3 / args.batch:6.2f} ms/img")


if __name__ == "__main__":
    main()
