"""Full-size numerical parity against the ACTUAL reference implementation
(VERDICT round-2 item 4).

The published ``sam_vit_h_4b8939.pth`` weights are not available in this
environment, so Dice parity cannot be demonstrated directly.  This test
closes the next-best gap: it synthesizes a fully RANDOM full-shape ViT-H
state dict (same builders as tests/test_convert_vith.py, with the
zeros-for-big-tensors shortcut removed), loads it into the reference's own
``build_sam_vit_h`` (torch, /root/reference/segment_anything/build_sam.py:14)
AND into our converter, and compares encoder embeddings and decoder logits
on the same 1024² input on CPU.  That upgrades the converter from
"shape-complete" to "numerics-verified at real size against the reference
binary itself" — any transpose/flip/packing mistake in the converter or any
math drift in the encoder stack would show up here.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_convert_vith as tcv
from samcarriestheburden_tpu.config import sam_vit_h_config
from samcarriestheburden_tpu.models import (
    convert, image_encoder, mask_decoder, prompt_encoder)


@pytest.mark.slow
def test_vith_logits_vs_reference_torch():
    torch = pytest.importorskip("torch")
    # the reference package imports torchvision (absent here) for resize/NMS
    # helpers this test never touches — stub the two modules it names
    import types

    for mod, names in (("torchvision", []),
                       ("torchvision.transforms", []),
                       ("torchvision.transforms.functional",
                        ["resize", "to_pil_image"]),
                       ("torchvision.ops", []),
                       ("torchvision.ops.boxes", ["batched_nms", "box_area"])):
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            for nm in names:
                setattr(m, nm, None)
            sys.modules[mod] = m
    sys.path.insert(0, "/root/reference")
    try:
        from segment_anything.build_sam import build_sam_vit_h
    finally:
        sys.path.remove("/root/reference")

    # fully random synth dict — 0.02-scaled normals for EVERY tensor so the
    # comparison exercises real numerics through all 32 blocks
    rng = np.random.default_rng(42)
    orig_fill = tcv._fill
    tcv._fill = lambda shape: rng.standard_normal(shape).astype(np.float32) * 0.02
    try:
        sd = tcv.synth_vit_h_state_dict()
    finally:
        tcv._fill = orig_fill

    cfg = sam_vit_h_config()
    ours = convert.sam_params_from_torch(sd, cfg)

    ref = build_sam_vit_h(checkpoint=None)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True), None
    ref.eval()

    x = rng.standard_normal((1, 3, 1024, 1024)).astype(np.float32)

    with torch.no_grad():
        emb_t = ref.image_encoder(torch.from_numpy(x)).numpy()
    emb_j = np.asarray(image_encoder.apply(ours["image_encoder"],
                                           cfg.image_encoder, jnp.asarray(x)))
    assert emb_j.shape == emb_t.shape == (1, 256, 64, 64)
    scale = np.abs(emb_t).max()
    np.testing.assert_allclose(emb_j, emb_t, atol=2e-3 * max(scale, 1.0),
                               err_msg="encoder embeddings diverge from the "
                                       "reference torch implementation")

    # decoder leg: SAME (reference) embeddings into both decoders
    coords = np.asarray([[[412.0, 500.0], [700.0, 300.0]]], np.float32)
    labels = np.asarray([[1, 0]], np.int32)
    with torch.no_grad():
        sp_t, dn_t = ref.prompt_encoder(
            points=(torch.from_numpy(coords), torch.from_numpy(labels)),
            boxes=None, masks=None)
        masks_t, iou_t = ref.mask_decoder(
            image_embeddings=torch.from_numpy(emb_t),
            image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sp_t,
            dense_prompt_embeddings=dn_t,
            multimask_output=True)
        masks_t, iou_t = masks_t.numpy(), iou_t.numpy()

    sp_j, dn_j = prompt_encoder.apply(ours["prompt_encoder"],
                                      cfg.prompt_encoder,
                                      points=(coords, labels))
    pe_j = prompt_encoder.get_dense_pe(ours["prompt_encoder"],
                                       cfg.prompt_encoder)
    masks_j, iou_j = mask_decoder.apply(ours["mask_decoder"], cfg.mask_decoder,
                                        jnp.asarray(emb_t), pe_j, sp_j, dn_j,
                                        multimask_output=True)
    mscale = np.abs(masks_t).max()
    np.testing.assert_allclose(np.asarray(masks_j), masks_t,
                               atol=2e-3 * max(mscale, 1.0))
    np.testing.assert_allclose(np.asarray(iou_j), iou_t, atol=2e-3)
