"""Device-trace the full SegEnhance leg at bench settings (enhance_batch 16)
and print the top ops by self time."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import tempfile

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
    rng = np.random.default_rng(0)
    seg_hw = UNET_INPUT_HW
    original_size = np.asarray([seg_hw[0] * 6, seg_hw[1] * 6])
    input_size = np.asarray([size, int(size * seg_hw[1] / seg_hw[0])])
    with tempfile.TemporaryDirectory() as tmp:
        h5path = f"{tmp}/emb.h5"
        with EmbeddingWriter(h5path, "bench.npz", size) as wr:
            wr.write("bench", np.zeros((1, cfg.image_encoder.out_chans,
                                        grid, grid), np.float32),
                     original_size, input_size)
        head = SamMaskDecoderHead(None, "vit_h", h5path,
                                  params=model.params, cfg=cfg,
                                  compute_dtype=jnp.bfloat16)
    refiner = SamSegRefiner(head, None,
                            [["box"], ["pos_points", "neg_points"]])
    enh = SegEnhance(refiner, "highest_probability", "dilation", "square", 8)
    num_iter = max(seg_hw)
    eb = 16

    def enhance_one(seg, feats, inp, orig):
        morphed = enh._morph(seg)
        refined, est = refiner._refine_batched(
            seg.astype(bool), feats, inp, orig, seg_hw)
        return refined, est, morphed

    @jax.jit
    def enhance_full(prob_segs, feats, inps, origs):
        segs = remove_all_but_one_connected_component(
            prob_segs, "highest_probability", num_iter)
        return jax.vmap(enhance_one)(segs, feats, inps, origs)

    yy, xx = np.mgrid[: seg_hw[0], : seg_hw[1]]
    prob = np.zeros((eb, N_CLASSES) + tuple(seg_hw), np.float32)
    for i in range(eb):
        for c in range(N_CLASSES):
            cy, cx = (rng.uniform(0.2, 0.8) * seg_hw[0],
                      rng.uniform(0.2, 0.8) * seg_hw[1])
            ry, rx = (rng.uniform(0.1, 0.3) * seg_hw[0],
                      rng.uniform(0.05, 0.2) * seg_hw[1])
            d2 = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
            prob[i, c] = np.clip(1.2 - d2, 0, 1)
    feats_b = jnp.asarray(rng.standard_normal(
        (eb, 1, cfg.mask_decoder.transformer_dim, grid, grid)), jnp.float32)
    args = (jnp.asarray(prob), feats_b,
            jnp.tile(jnp.asarray(input_size)[None], (eb, 1)),
            jnp.tile(jnp.asarray(original_size)[None], (eb, 1)))
    out = enhance_full(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace("/tmp/prof_enhance"):
        for _ in range(2):
            out = enhance_full(*args)
        jax.block_until_ready(out)

    import glob
    import gzip
    import json
    from collections import defaultdict

    path = sorted(glob.glob("/tmp/prof_enhance/**/*.trace.json.gz",
                            recursive=True))[-1]
    ev = json.loads(gzip.open(path).read()).get("traceEvents", [])
    d = defaultdict(lambda: [0.0, 0])
    for e in ev:
        if e.get("ph") == "X" and e.get("dur"):
            d[e.get("name", "")][0] += e["dur"]
            d[e.get("name", "")][1] += 1
    for name, (dur, cnt) in sorted(d.items(), key=lambda x: -x[1][0])[:40]:
        if any(s in name for s in ("block_until", "try_to", "trace",
                                   "__exit__", "stop_trace", "$")):
            continue
        print(f"  {dur/1e3:9.2f} ms x{cnt:5d}  {name[:95]}")


if __name__ == "__main__":
    main()
