"""SAM-refined pseudo-label export
(reference scripts/save_refined_segmentations.py).

python -m samcarriestheburden_tpu.cli.save_refined_segmentations --model_id <id>
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Save SAM-refined segmentations")
    p.add_argument("--model_id", type=str, required=True)
    p.add_argument("--n_files", type=str, default="all", help="'500' or 'all'")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--refiner", choices=["sam", "rndwalk"], default="sam",
                   help="refinement engine: the reference's SAM protocol, or "
                        "the random-walk baseline (reference seg_refinement"
                        ".py:119) writing rndwalk_<count>.h5 for "
                        "train_on_pseudo_labels --pseudo_label rndwalk")
    p.add_argument("--bg_erosion_radius", type=int, default=8,
                   help="rndwalk: background seed erosion radius")
    p.add_argument("--laplace_sigma", type=float, default=5.0,
                   help="rndwalk: edge-weight sigma")
    p.add_argument("--sam_type", choices=["SAM", "MedSAM"], default="SAM")
    p.add_argument("--sam_checkpoint", type=str, default=None,
                   help="override the sam_type checkpoint convention")
    p.add_argument("--sam_model_type", type=str, default=None,
                   help="override: vit_h|vit_l|vit_b|vit_t")
    p.add_argument("--embeddings", type=str, default=None,
                   help="override the embeddings h5 path")
    # authors' HPO-selected refinement config (reference :25-31)
    p.add_argument("--prompt1st", nargs="*", default=["box"])
    p.add_argument("--prompt2nd", nargs="*", default=["pos_points", "neg_points"])
    p.add_argument("--ccl_selection", default="highest_probability")
    p.add_argument("--morph_op", default="dilation")
    p.add_argument("--struct_elem", default="square")
    p.add_argument("--radius", type=int, default=8)
    p.add_argument("--decoder_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="decoder compute precision; float32 is the torch-"
                        "parity default, bfloat16 the TPU serving opt-in")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--img_batch", type=int, default=8,
                   help="images per device dispatch (1 = reference-style "
                        "per-image loop); batching amortises the decoder's "
                        "dispatch overhead across the sweep")
    from samcarriestheburden_tpu.cli.common import (
        add_multihost_flags, add_profile_flag, profiled, setup_backend)
    add_profile_flag(p)
    add_multihost_flags(p)
    args = p.parse_args(argv)
    setup_backend(args)

    import cv2
    import jax
    import jax.numpy as jnp
    from tqdm import tqdm

    from samcarriestheburden_tpu.cli.save_segmentations import select_unlabeled_files
    from samcarriestheburden_tpu.config import GRAZ_IMG_MEAN, GRAZ_IMG_STD, UNET_INPUT_HW
    from samcarriestheburden_tpu.data.h5io import MaskWriter
    from samcarriestheburden_tpu.engine.refinement import SamSegRefiner, SegEnhance
    from samcarriestheburden_tpu.models import unet
    from samcarriestheburden_tpu.models.modelio import ModelRegistry

    registry = ModelRegistry(f"{args.data_root}/model_registry")
    unet_cfg, params = registry.load(args.model_id)
    H, W = UNET_INPUT_HW

    refine_params = {
        "ccl_selection": args.ccl_selection,
        "morph_op": args.morph_op,
        "struct_elem": args.struct_elem,
        "radius": args.radius,
    }
    if args.refiner == "rndwalk":
        from samcarriestheburden_tpu.engine.refinement import RndWalkSegRefiner

        refine_params.update({"bg_erosion_radius": args.bg_erosion_radius,
                              "laplace_sigma": args.laplace_sigma})
        refiner = RndWalkSegRefiner(
            args.bg_erosion_radius, args.laplace_sigma,
            img_path=Path(args.data_root) / "img_only_front_all_left")
        args.img_batch = 1  # per-image solver, no batched path
    else:
        refine_params["prompts2use"] = [list(args.prompt1st),
                                        list(args.prompt2nd)]
        if args.sam_checkpoint is not None:
            from samcarriestheburden_tpu.engine.decoder_head import \
                SamMaskDecoderHead

            head = SamMaskDecoderHead(
                args.sam_checkpoint, args.sam_model_type, args.embeddings,
                compute_dtype={"float32": jnp.float32,
                               "bfloat16": jnp.bfloat16}[args.decoder_dtype])
            refiner = SamSegRefiner(head, None, refine_params["prompts2use"])
        else:
            refiner = SamSegRefiner(args.sam_type, None,
                                    refine_params["prompts2use"],
                                    data_root=args.data_root)
    seg_processor = SegEnhance(refiner, refine_params["ccl_selection"],
                               refine_params["morph_op"],
                               refine_params["struct_elem"],
                               refine_params["radius"], None)
    print(f"Refine model {args.model_id} segmentation with {refine_params}")

    @jax.jit
    def predict_probs(x):
        x = (x - GRAZ_IMG_MEAN) / GRAZ_IMG_STD
        return jax.nn.sigmoid(unet.apply(params, unet_cfg, x))

    files = select_unlabeled_files(args.data_root, args.n_files)
    img_dir = Path(args.data_root) / "img_only_front_all_left"
    count = len(files) if args.n_files != "500" else 500
    if args.refiner == "rndwalk":
        name = f"rndwalk_{count}.h5"
    else:
        id_str = "_".join(args.prompt1st) + "_refine_" + "_".join(args.prompt2nd)
        name = f"sam_{id_str}_{count}.h5"
    out = Path(args.data_root) / "seg_masks" / args.model_id / name
    if jax.process_count() > 1:
        # multi-host sweep: each process refines its strided slice of the
        # file list on its local chip(s) (per-image work, no collectives) and
        # writes <out>.part<p>; merge with data.h5io.merge_mask_shards
        from samcarriestheburden_tpu.parallel.distributed import process_shard

        files = process_shard(files)
        out = Path(str(out) + f".part{jax.process_index()}")

    attrs = {"refine_params": json.dumps(refine_params),
             "model_id": args.model_id}
    if jax.process_count() > 1:
        # shard provenance: merge_mask_shards rejects .part files whose
        # claimed shard_count disagrees with what it globbed (stale leftovers
        # from an earlier run with a different process count)
        attrs["shard_count"] = jax.process_count()
    with profiled(args.profile) as timer, \
            MaskWriter(out, attrs=attrs) as writer:
        if timer is None:
            from samcarriestheburden_tpu.profiling import PhaseTimer
            timer = PhaseTimer(sync=False)  # no-op accounting
        from samcarriestheburden_tpu.ops.mask_ops import (packbits_device,
                                                          unpackbits_host)

        bs = max(1, args.img_batch)
        pack = W % 8 == 0  # device-side bit-pack: 8x smaller host fetch
        pending = None  # (chunk, refined_dev, est_dev): fetched one batch
        # late so the host-device round-trip overlaps the next dispatch

        def flush(p):
            chunk_, refined_, est_ = p
            with timer.phase("h5_write"):
                if pack:
                    refined_ = unpackbits_host(np.asarray(refined_), W)
                refined_ = np.asarray(refined_).astype(np.uint8)
                est_ = np.asarray(est_)
                for j, name in enumerate(chunk_):
                    writer.write(name, refined_[j], estimated_dice=est_[j])

        for i in tqdm(range(0, len(files), bs), unit="batch",
                      desc="Refine segmentation"):
            chunk = files[i:i + bs]
            with timer.phase("load+unet"):
                imgs = []
                for name in chunk:
                    img = cv2.imread(str(img_dir / f"{name}.png"),
                                     cv2.IMREAD_GRAYSCALE)
                    imgs.append(cv2.resize(img, (W, H),
                                           interpolation=cv2.INTER_LINEAR))
                x = jnp.asarray(np.stack(imgs)[:, None].astype(np.float32) / 255.0)
                y_hat = predict_probs(x)
            with timer.phase("enhance"):
                if bs == 1:
                    refined, est_dice = seg_processor.enhance(y_hat[0], chunk[0])
                    if est_dice is None:  # rndwalk has no IoU-head signal
                        est_dice = jnp.full((refined.shape[0],), jnp.nan)
                    refined, est_dice = refined[None], est_dice[None]
                else:
                    refined, est_dice = seg_processor.enhance_batch(y_hat, chunk)
            if pack:
                refined = packbits_device(refined)
            if pending is not None:
                flush(pending)
            pending = (chunk, refined, est_dice)
        if pending is not None:
            flush(pending)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
