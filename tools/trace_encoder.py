"""Trace the production encoder path on-chip and print top device ops.

Usage: python tools/trace_encoder.py [--quantize int8] [--batch 4] [--model vit_h]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", choices=["int8"], default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=28)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.engine.embeddings import make_serving_encoder
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = getattr(_config, f"sam_{args.model}_config")()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    model = SamModel(cfg=cfg, params=params)
    size = model.img_size

    encode, params = make_serving_encoder(model, jnp.bfloat16,
                                          quantize=args.quantize)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (args.batch, 3, size, size)),
                       jnp.uint8)
    sizes = jnp.tile(jnp.asarray([[size, int(size * 0.7)]], jnp.int32),
                     (args.batch, 1))
    t0 = time.perf_counter()
    out = encode(params, imgs, sizes)
    print(f"compiled+first in {time.perf_counter()-t0:.0f}s "
          f"sum={float(jnp.sum(out.astype(jnp.float32))):.3e}", flush=True)

    tmp = tempfile.mkdtemp(prefix="tr_enc_")
    with jax.profiler.trace(tmp):
        for _ in range(args.iters):
            float(jnp.sum(encode(params, imgs, sizes).astype(jnp.float32)))

    from parse_trace import find_xplane
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([find_xplane(tmp)],
                                      "framework_op_stats", {})
    tables = json.loads(data)
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in tables[0]["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"]
    dev.sort(key=lambda r: -r["total_self_time"])
    busy = sum(r["total_self_time"] for r in dev if r["operation"] != "IDLE")
    n = args.iters * args.batch
    print(f"device busy {busy/args.iters/1e3:.1f} ms/iter "
          f"= {busy/n/1e3:.1f} ms/img")
    for r in dev[:args.top]:
        print(f"{r['total_self_time']/n:9.1f} us/img {r['occurrences']:5.0f}x "
              f"{r['operation'][:95]}")


if __name__ == "__main__":
    main()
