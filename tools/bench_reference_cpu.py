"""Measured anchor for the refinement-architecture speedup claim.

Runs the REFERENCE implementation's own per-image refinement protocol
(`/root/reference/segment_anything/sam_mask_decoder_head.py` ``predict_mask``
driven 17 classes x 2 rounds sequentially, exactly like
seg_refinement.py:105-114) against this repo's batched path
(`SamSegRefiner._refine_batched`: 2 device dispatches per image) — SAME
random vit_b weights (shared .pth), SAME embeddings h5, SAME prompts, SAME
machine (CPU) — and prints the per-image times and the ratio.

BENCH_r*.json's ``vs_baseline`` uses a literature-derived absolute estimate
(A100 figures); this tool gives a hardware-controlled MEASUREMENT of the
architecture factor for the decode leg, which VERDICT r1 asked for.

Round 3 adds the ENCODER leg (VERDICT #3): the reference's torch vit_b
image encoder at the real 1024x1024 input vs ours (same random weights via
the .pth converter, same single CPU), composing a fully *measured*
same-hardware cost-structure ratio alongside the A100-literature estimate.
Results persist to BENCH_cpu_anchor.json at the repo root; bench.py embeds
them into its JSON detail as ``vs_baseline_measured_cpu``.

Usage: python tools/bench_reference_cpu.py [--classes 17] [--imgs 3]
                                           [--encoder_iters 2] [--no_encoder]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=17)
    ap.add_argument("--imgs", type=int, default=3)
    ap.add_argument("--encoder_iters", type=int, default=2)
    ap.add_argument("--no_encoder", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import h5py
    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    # torchvision isn't installed here; the reference only touches it for
    # AMG NMS and image resizing, neither on the decode path — stub it
    import types

    def _unused(*a, **k):
        raise NotImplementedError("torchvision stub (not on the decode path)")

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.batched_nms = tv_boxes.box_area = _unused
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_fn = types.ModuleType("torchvision.transforms.functional")
    tv_fn.resize = tv_fn.to_pil_image = _unused
    tv.ops = tv_ops
    tv_ops.boxes = tv_boxes
    tv.transforms = tv_tr
    tv_tr.functional = tv_fn
    for name, mod in [("torchvision", tv), ("torchvision.ops", tv_ops),
                      ("torchvision.ops.boxes", tv_boxes),
                      ("torchvision.transforms", tv_tr),
                      ("torchvision.transforms.functional", tv_fn)]:
        sys.modules[name] = mod

    sys.path.insert(0, "/root/reference")
    from segment_anything import sam_model_registry  # reference package
    from segment_anything.sam_mask_decoder_head import SAMMaskDecoderHead
    from segment_anything.utils.prompt_utils import Prompt

    tmp = Path(tempfile.mkdtemp())
    ckpt = tmp / "sam_vit_b_rand.pth"
    torch.manual_seed(0)
    sam = sam_model_registry["vit_b"]()
    torch.save(sam.state_dict(), ckpt)
    del sam

    # embeddings h5 in the shared schema
    rng = np.random.default_rng(0)
    h5path = tmp / "emb.h5"
    stems = [f"img{i}" for i in range(args.imgs)]
    with h5py.File(h5path, "w") as f:
        f.attrs["checkpoint"] = ckpt.name
        f.attrs["img_encoder_img_size"] = 1024
        for s in stems:
            g = f.create_group(f"img_embedding/{s}")
            g.create_dataset("features", data=rng.standard_normal(
                (1, 256, 64, 64)).astype(np.float32))
            g.attrs["original_size"] = np.asarray([2304, 1344])
            g.attrs["input_size"] = np.asarray([1024, 597])

    seg_hw = (384, 224)
    C = args.classes
    prompts = []          # torch tensors — the reference API's native type
    boxes_np = []
    for c in range(C):
        cy, cx = rng.uniform(60, 320), rng.uniform(40, 180)
        pos = np.asarray([[cx, cy]], np.float32)
        negs = np.stack([np.clip([cx + rng.uniform(-80, 80),
                                  cy + rng.uniform(-120, 120)], 0, 220)
                         for _ in range(C - 1)]).astype(np.float32)
        box = np.asarray([max(cx - 30, 0), max(cy - 50, 0),
                          min(cx + 30, 223), min(cy + 50, 383)], np.float32)
        boxes_np.append(box)
        prompts.append(Prompt(class_idx=c, img_size=seg_hw,
                              pos_seeds=torch.from_numpy(pos),
                              neg_seeds=torch.from_numpy(negs),
                              box=torch.from_numpy(box)))

    # ---- reference: 17 classes x 2 rounds, sequential torch calls --------
    head_t = SAMMaskDecoderHead(ckpt, "vit_b", "cpu", h5path)

    def ref_refine_image(stem):
        for p in prompts:
            _, _, low_res = head_t.predict_mask(stem, p, ["box"])
            head_t.predict_mask(stem, p, ["pos_points", "neg_points"],
                                mask_prev_iter=low_res)

    ref_refine_image(stems[0])  # warm any lazy init
    t0 = time.perf_counter()
    for s in stems:
        ref_refine_image(s)
    t_ref = (time.perf_counter() - t0) / len(stems)

    # ---- ours: batched 2-dispatch path, same weights/h5 ------------------
    from samcarriestheburden_tpu.engine.decoder_head import SamMaskDecoderHead
    from samcarriestheburden_tpu.engine.refinement import SamSegRefiner

    head_j = SamMaskDecoderHead(ckpt, "vit_b", h5path)
    refiner = SamSegRefiner(head_j, None,
                            [["box"], ["pos_points", "neg_points"]])
    # build the (C, H, W) masks whose extracted prompts mirror the above
    seg = np.zeros((C, *seg_hw), np.float32)
    for c, box in enumerate(boxes_np):
        x0, y0, x1, y1 = box.astype(int)
        seg[c, y0:y1 + 1, x0:x1 + 1] = 0.9
    np.asarray(refiner.refine(seg, stems[0])[0])  # compile
    t0 = time.perf_counter()
    for s in stems:
        np.asarray(refiner.refine(seg, s)[0])
    t_ours = (time.perf_counter() - t0) / len(stems)

    import json

    result = {
        "reference_sequential_s_per_img": round(t_ref, 3),
        "ours_batched_s_per_img": round(t_ours, 3),
        "architecture_speedup_same_cpu": round(t_ref / t_ours, 2),
        "classes": C, "hardware": "cpu (identical for both)",
    }

    # ---- encoder leg: torch vit_b 1024^2 forward vs ours, same weights ---
    if not args.no_encoder:
        x_np = rng.standard_normal((1, 3, 1024, 1024)).astype(np.float32)

        sam_t = sam_model_registry["vit_b"](checkpoint=str(ckpt))
        sam_t.eval()
        with torch.no_grad():
            xt = torch.from_numpy(x_np)
            sam_t.image_encoder(xt)  # warm
            t0 = time.perf_counter()
            for _ in range(args.encoder_iters):
                sam_t.image_encoder(xt)
        t_enc_ref = (time.perf_counter() - t0) / args.encoder_iters
        del sam_t

        import jax.numpy as jnp

        from samcarriestheburden_tpu.models import image_encoder
        from samcarriestheburden_tpu.models.build import \
            sam_model_registry as our_registry

        model_j = our_registry["vit_b"](checkpoint=str(ckpt))
        enc = jax.jit(lambda p, x: image_encoder.apply(
            p, model_j.cfg.image_encoder, x))
        xj = jnp.asarray(x_np)
        np.asarray(enc(model_j.params["image_encoder"], xj))  # compile
        t0 = time.perf_counter()
        for _ in range(args.encoder_iters):
            np.asarray(enc(model_j.params["image_encoder"], xj))
        t_enc_ours = (time.perf_counter() - t0) / args.encoder_iters

        result.update({
            "reference_encoder_s_per_img": round(t_enc_ref, 3),
            "ours_encoder_s_per_img": round(t_enc_ours, 3),
            "encoder_speedup_same_cpu": round(t_enc_ref / t_enc_ours, 3),
            "composed_speedup_same_cpu": round(
                (t_enc_ref + t_ref) / (t_enc_ours + t_ours), 3),
            "encoder_model": "vit_b fp32 1024^2 (same random .pth weights)",
        })

    out = Path(__file__).resolve().parent.parent / "BENCH_cpu_anchor.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
