"""Measure BASELINE.json configs 3-5 on the current backend.

* config 3 — full refinement sweep throughput: ``SegEnhance.enhance`` (CCL +
  dilation + prompt extraction + 2-round SAM decode + postprocess) driven the
  way ``cli.save_refined_segmentations`` drives it, per-image h5 feature reads
  included (reference scripts/save_refined_segmentations.py loop).
* config 4 — U-Net f_phi pseudo-label training (reference
  training_on_pseudo_labels shapes: batch 16, 384x224, 17 classes): ms/step
  with and without augmentation, via the epoch-scan trainer.
* config 5 — SamAutomaticMaskGenerator whole-image AMG (reference
  scripts/amg.py defaults: 32x32 grid, batches of 64): sec/image after the
  first compiled image.

Prints one JSON object.  Weights are shape-only zeros (throughput does not
depend on values); ``--smoke`` shrinks everything onto CPU for CI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _zeros_like_tree(shapes):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def bench_refine_sweep(model_name: str, n_imgs: int, seg_hw, smoke: bool):
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.config import N_CLASSES
    from samcarriestheburden_tpu.data.h5io import EmbeddingWriter
    from samcarriestheburden_tpu.engine.decoder_head import SamMaskDecoderHead
    from samcarriestheburden_tpu.engine.refinement import (SamSegRefiner,
                                                           SegEnhance)
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = getattr(_config, f"sam_{model_name}_config")()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = _zeros_like_tree(shapes)
    model = SamModel(cfg=cfg, params=params)
    grid = cfg.prompt_encoder.image_embedding_size[0]
    size = model.img_size
    rng = np.random.default_rng(0)

    tmp = tempfile.mkdtemp()
    h5path = str(Path(tmp) / "emb.h5")
    stems = [f"img{i:04d}" for i in range(n_imgs)]
    with EmbeddingWriter(h5path, "bench.npz", size) as wr:
        for s in stems:
            wr.write(s, rng.standard_normal(
                (1, cfg.image_encoder.out_chans, grid, grid)).astype(np.float32),
                (seg_hw[0] * 6, seg_hw[1] * 6),
                (size, int(size * seg_hw[1] / seg_hw[0])), compression=None)

    head = SamMaskDecoderHead(None, model_name, h5path,
                              params=model.params, cfg=cfg)
    refiner = SamSegRefiner(head, None, [["box"], ["pos_points", "neg_points"]])
    enh = SegEnhance(refiner, "highest_probability", "dilation", "square", 8)

    yy, xx = np.mgrid[: seg_hw[0], : seg_hw[1]]
    segs = []
    for i in range(n_imgs):
        prob = np.zeros((N_CLASSES,) + tuple(seg_hw), np.float32)
        for c in range(N_CLASSES):
            cy = rng.uniform(0.2, 0.8) * seg_hw[0]
            cx = rng.uniform(0.2, 0.8) * seg_hw[1]
            ry = rng.uniform(0.1, 0.3) * seg_hw[0]
            rx = rng.uniform(0.05, 0.2) * seg_hw[1]
            prob[c] = np.clip(1.2 - ((yy - cy) / ry) ** 2
                              - ((xx - cx) / rx) ** 2, 0, 1)
        segs.append(prob)

    # warm (compile) on the first stem, then time the sweep
    np.asarray(enh.enhance(segs[0], stems[0])[0])
    t0 = time.perf_counter()
    for s, prob in zip(stems, segs):
        refined, est = enh.enhance(prob, s)
        np.asarray(refined)  # host sync, like the CLI writing to h5
    dt = time.perf_counter() - t0

    # image-batched sweep (cli --img_batch): one dispatch per chunk, fetch
    # pipelined one batch behind (the CLI does the same — over a remote
    # tunnel the per-fetch round-trip otherwise dominates)
    from samcarriestheburden_tpu.ops.mask_ops import packbits_device

    bs = min(8, n_imgs)
    seg_arr = np.stack(segs)
    np.asarray(packbits_device(enh.enhance_batch(seg_arr[:bs], stems[:bs])[0]))
    t0 = time.perf_counter()
    pending = None
    for i in range(0, n_imgs, bs):
        refined, est = enh.enhance_batch(seg_arr[i:i + bs], stems[i:i + bs])
        if pending is not None:
            np.asarray(pending)
        pending = packbits_device(refined)
    np.asarray(pending)
    dt_b = time.perf_counter() - t0
    return {"images_per_sec": round(n_imgs / dt, 3),
            "images_per_sec_batched": round(n_imgs / dt_b, 3),
            "img_batch": bs, "n_images": n_imgs, "seg_hw": list(seg_hw)}


def bench_training(smoke: bool):
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu.config import TrainConfig, UNetConfig
    from samcarriestheburden_tpu.train.loop import UNetTrainer

    hw = (48, 32) if smoke else (384, 224)
    batch = 4 if smoke else 16
    n = 43  # reference num_train_samples for f_phi
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 1, *hw)).astype(np.float32)
    y = (rng.random((n, 17, *hw)) > 0.9).astype(np.uint8)

    out = {}
    for aug in (0.0, 0.5):
        tcfg = TrainConfig(batch_size=batch, data_aug=aug,
                           data_sample_per_epoch=48, epochs=1)
        ucfg = UNetConfig(n_channels=1, n_classes=17)
        trainer = UNetTrainer(ucfg, tcfg)
        r = np.random.default_rng(1)
        trainer.train_epoch(x, y, 0, r)  # compile
        t0 = time.perf_counter()
        iters = 2 if smoke else 3
        for e in range(1, 1 + iters):
            trainer.train_epoch(x, y, e, r)
        steps = iters * (48 // batch)
        out[f"ms_per_step_aug{aug:g}"] = round(
            1e3 * (time.perf_counter() - t0) / steps, 1)
    return out


def bench_amg(model_name: str, smoke: bool, pps: int = 32):
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.engine.amg import SamAutomaticMaskGenerator
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = getattr(_config, f"sam_{model_name}_config")()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = _zeros_like_tree(shapes)
    model = SamModel(cfg=cfg, params=params)
    pps = 8 if smoke else pps
    amg = SamAutomaticMaskGenerator(model, points_per_side=pps,
                                    pred_iou_thresh=-1e9,  # zero weights ->
                                    stability_score_thresh=0.0,  # keep all
                                    output_mode="uncompressed_rle")
    # binary_mask output would re-decode EVERY kept RLE to a full-res numpy
    # mask (hundreds of MB) — time the serving-format path instead
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (512 if smoke else 1024,
                                int((512 if smoke else 1024) * 0.7), 3),
                       dtype=np.uint8)
    amg.generate(img)  # compile
    iters = 1 if smoke else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        amg.generate(img)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_image": round(dt, 3), "points_per_side": pps}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--model", default="vit_h")
    p.add_argument("--n_imgs", type=int, default=32,
                   help="refinement sweep size")
    p.add_argument("--only", choices=["refine", "train", "amg"], default=None)
    p.add_argument("--pps", type=int, default=32,
                   help="AMG points per side (reference default 32)")
    args = p.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    model_name = "vit_t" if args.smoke else args.model
    seg_hw = (48, 32) if args.smoke else (384, 224)
    n_imgs = 4 if args.smoke else args.n_imgs

    out = {"platform": jax.devices()[0].platform, "model": model_name}
    if args.only in (None, "refine"):
        out["config3_refinement_sweep"] = bench_refine_sweep(
            model_name, n_imgs, seg_hw, args.smoke)
    if args.only in (None, "train"):
        out["config4_unet_training"] = bench_training(args.smoke)
    if args.only in (None, "amg"):
        out["config5_amg"] = bench_amg(model_name, args.smoke, args.pps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
