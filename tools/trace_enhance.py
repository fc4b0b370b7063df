"""Trace the full SegEnhance.enhance path (bench.py's refinement leg) on-chip
and print top device ops.

Usage: python tools/trace_enhance.py [--eb 8] [--iters 4] [--top 30]
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
    ap.add_argument("--eb", type=int, default=8, help="enhance batch")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.config import N_CLASSES, UNET_INPUT_HW
    from samcarriestheburden_tpu.data.h5io import EmbeddingWriter
    from samcarriestheburden_tpu.engine.decoder_head import SamMaskDecoderHead
    from samcarriestheburden_tpu.engine.refinement import (SamSegRefiner,
                                                           SegEnhance)
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init
    from samcarriestheburden_tpu.ops.ccl import \
        remove_all_but_one_connected_component

    cfg = _config.sam_vit_h_config()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    model = SamModel(cfg=cfg, params=params)
    size = model.img_size
    grid = cfg.prompt_encoder.image_embedding_size[0]

    seg_hw = UNET_INPUT_HW
    original_size = np.asarray([seg_hw[0] * 6, seg_hw[1] * 6])
    input_size = np.asarray([size, int(size * seg_hw[1] / seg_hw[0])])
    with tempfile.TemporaryDirectory() as tmpd:
        h5path = f"{tmpd}/emb.h5"
        with EmbeddingWriter(h5path, "bench.npz", size) as wr:
            wr.write("bench", np.zeros((1, cfg.image_encoder.out_chans,
                                        grid, grid), np.float32),
                     original_size, input_size)
        head = SamMaskDecoderHead(None, "vit_h", h5path, params=model.params,
                                  cfg=cfg, compute_dtype=jnp.bfloat16)
    refiner = SamSegRefiner(head, None,
                            [["box"], ["pos_points", "neg_points"]])
    enh = SegEnhance(refiner, "highest_probability", "dilation", "square", 8)
    num_iter = max(seg_hw)

    def enhance_one(seg, feats, inp, orig):
        morphed = enh._morph(seg)
        refined, est = refiner._refine_batched(
            seg.astype(bool), feats, inp, orig, seg_hw)
        return refined, est, morphed

    eb = args.eb

    @jax.jit
    def enhance_full(prob_segs, feats, inps, origs):
        # whole-batch CCL call — vmap would run both exactness-cond branches
        segs = remove_all_but_one_connected_component(
            prob_segs, "highest_probability", num_iter)
        return (jax.vmap(enhance_one) if eb > 1 else enhance_one)(
            segs, feats, inps, origs)

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[: seg_hw[0], : seg_hw[1]]
    prob = np.zeros((eb, N_CLASSES) + tuple(seg_hw), np.float32)
    for i in range(eb):
        for c in range(N_CLASSES):
            cy, cx = rng.uniform(0.2, 0.8) * seg_hw[0], rng.uniform(0.2, 0.8) * seg_hw[1]
            ry, rx = rng.uniform(0.1, 0.3) * seg_hw[0], rng.uniform(0.05, 0.2) * seg_hw[1]
            d2 = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
            prob[i, c] = np.clip(1.2 - d2, 0, 1)
    features = jnp.asarray(rng.standard_normal(
        (1, cfg.mask_decoder.transformer_dim, grid, grid)), jnp.float32)

    def tile(a):
        return jnp.tile(jnp.asarray(a)[None], (eb,) + (1,) * np.ndim(a))

    fa = (jnp.asarray(prob), tile(features), tile(input_size),
          tile(original_size))

    def run():
        outs = enhance_full(*fa)
        return float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))

    t0 = time.perf_counter()
    run()
    print(f"compiled+first in {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        run()
    wall = (time.perf_counter() - t0) / args.iters / eb
    print(f"wall {1e3*wall:.2f} ms/img", flush=True)

    tmp = tempfile.mkdtemp(prefix="tr_enh_")
    with jax.profiler.trace(tmp):
        for _ in range(args.iters):
            run()

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
    n = args.iters * eb
    print(f"device busy {busy/args.iters/1e3:.1f} ms/iter "
          f"= {busy/n/1e3:.2f} ms/img")
    for r in dev[:args.top]:
        print(f"{r['total_self_time']/n:9.1f} us/img {r['occurrences']:5.0f}x "
              f"{r['operation'][:95]}")


if __name__ == "__main__":
    main()
