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
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_convert_vith as tcv
from samcarriestheburden_tpu.config import sam_vit_h_config
from samcarriestheburden_tpu.models import (
    convert, image_encoder, mask_decoder, prompt_encoder)


def _install_torchvision_stub():
    """The reference package imports torchvision at module import time for
    resize/NMS helpers.  torchvision is absent here, so install WORKING
    stand-ins (PIL resize with torchvision's PIL semantics, greedy NMS with
    torchvision's keep-if-iou<=thr semantics) so reference code paths that
    actually call them — SamPredictor.set_image, the AMG NMS passes — run
    for real.  Attributes are (re)set even if a stub module already exists."""
    import torch
    from PIL import Image

    def to_pil_image(a):
        if isinstance(a, torch.Tensor):
            a = a.numpy()
        return Image.fromarray(a)

    def resize(img, size):
        # torchvision F.resize on a PIL input with the default
        # InterpolationMode.BILINEAR delegates to PIL's Image.resize
        return img.resize((size[1], size[0]), Image.BILINEAR)

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def _nms(boxes, scores, thr):
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel():
            i = order[0]
            keep.append(int(i))
            if order.numel() == 1:
                break
            rest = order[1:]
            xy1 = torch.maximum(boxes[i, :2], boxes[rest, :2])
            xy2 = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
            inter = (xy2 - xy1).clamp(min=0).prod(1)
            iou = inter / (box_area(boxes[i][None])[0]
                           + box_area(boxes[rest]) - inter)
            # torchvision removes iff iou > thr; NaN (degenerate boxes) kept
            order = rest[~(iou > thr)]
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty(0, dtype=torch.long)
        offset = idxs.to(boxes) * (boxes.max() + 1)
        return _nms(boxes + offset[:, None], scores, iou_threshold)

    impls = {
        "torchvision": {},
        "torchvision.transforms": {},
        "torchvision.transforms.functional": {
            "resize": resize, "to_pil_image": to_pil_image},
        "torchvision.ops": {},
        "torchvision.ops.boxes": {
            "batched_nms": batched_nms, "box_area": box_area},
    }
    for mod, names in impls.items():
        m = sys.modules.setdefault(mod, types.ModuleType(mod))
        for nm, fn in names.items():
            setattr(m, nm, fn)


@pytest.mark.slow
def test_vith_logits_vs_reference_torch():
    torch = pytest.importorskip("torch")
    _install_torchvision_stub()
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


@pytest.mark.slow
def test_refinement_protocol_vs_reference_torch(tmp_path):
    """End-to-end parity of the 2-round refinement decode protocol against
    the reference's OWN torch implementation (sam_mask_decoder_head.py +
    prompt_utils.py), sharing one embeddings artifact written by OUR
    EmbeddingWriter (verifying h5 byte-compatibility with their reader):

      PromptExtractor(mask) -> predict_mask(['box'])
        -> predict_mask(['pos_points','neg_points'], mask_prev_iter=low_res)

    on a synthetic random vit_b checkpoint.  Covers prompt extraction math,
    coordinate frame scaling, prompt assembly/padding, both decode rounds
    (incl. the low-res-logit mask feedback) and the 256->1024->crop->original
    postprocess — the full protocol of SURVEY stack 3.2, not just the model
    forward."""
    torch = pytest.importorskip("torch")
    _install_torchvision_stub()
    sys.path.insert(0, "/root/reference")
    try:
        from segment_anything import sam_model_registry as ref_registry
        from segment_anything.sam_mask_decoder_head import \
            SAMMaskDecoderHead as RefHead
        from segment_anything.utils.prompt_utils import \
            PromptExtractor as RefExtractor
    finally:
        sys.path.remove("/root/reference")

    from samcarriestheburden_tpu.data.h5io import EmbeddingWriter
    from samcarriestheburden_tpu.engine.decoder_head import SamMaskDecoderHead
    from samcarriestheburden_tpu.engine.prompts import PromptExtractor

    torch.manual_seed(0)
    ref_sam = ref_registry["vit_b"](checkpoint=None)
    ckpt = tmp_path / "sam_vit_b_synth.pth"
    torch.save(ref_sam.state_dict(), ckpt)
    del ref_sam

    rng = np.random.default_rng(7)
    features = rng.standard_normal((1, 256, 64, 64)).astype(np.float32)
    original_size = np.asarray([768, 512])
    input_size = np.asarray([1024, 683])  # ResizeLongestSide(768,512 -> 1024)
    h5 = tmp_path / "emb.h5"
    with EmbeddingWriter(h5, ckpt.name, 1024) as wr:
        wr.write("img0", features, original_size, input_size)

    ref_head = RefHead(ckpt, "vit_b", "cpu", h5)
    our_head = SamMaskDecoderHead(ckpt, "vit_b", h5)

    # synthetic U-Net-style prediction: 3 blobs + 1 empty class
    mask = np.zeros((4, 384, 224), bool)
    yy, xx = np.mgrid[:384, :224]
    for c, (cy, cx, ry, rx) in enumerate([(100, 60, 45, 25),
                                          (210, 120, 60, 30),
                                          (320, 80, 30, 40)]):
        mask[c] = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0

    ref_prompts = RefExtractor(torch.from_numpy(mask)).extract()
    our_prompts = PromptExtractor(mask).extract()
    assert len(ref_prompts) == len(our_prompts) == 3

    for rp, op in zip(ref_prompts, our_prompts):
        assert rp.class_idx == op.class_idx
        np.testing.assert_array_equal(rp.pos_seeds.numpy(), op.pos_seeds)
        np.testing.assert_array_equal(
            np.sort(rp.neg_seeds.numpy(), axis=0), np.sort(op.neg_seeds, axis=0))
        np.testing.assert_array_equal(rp.box.numpy(), op.box)

        rm1, riou1, rlow1 = ref_head.predict_mask("img0", rp, ["box"])
        rm2, riou2, rlow2 = ref_head.predict_mask(
            "img0", rp, ["pos_points", "neg_points"], mask_prev_iter=rlow1)
        om1, oiou1, olow1 = our_head.predict_mask("img0", op, ["box"])
        om2, oiou2, olow2 = our_head.predict_mask(
            "img0", op, ["pos_points", "neg_points"], mask_prev_iter=olow1)

        for rlow, olow in ((rlow1, olow1), (rlow2, olow2)):
            rl = rlow.numpy()
            scale = max(np.abs(rl).max(), 1.0)
            np.testing.assert_allclose(np.asarray(olow), rl,
                                       atol=2e-3 * scale)
        np.testing.assert_allclose(np.asarray(oiou1), riou1.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(oiou2), riou2.numpy(), atol=2e-3)
        for rm, om in ((rm1, om1), (rm2, om2)):
            agree = np.mean(rm.numpy() == np.asarray(om))
            assert agree > 0.999, f"mask agreement {agree}"


@pytest.mark.slow
def test_amg_vs_reference_torch(tmp_path):
    """Full SamAutomaticMaskGenerator protocol parity against the reference
    torch stack (automatic_mask_generator.py + predictor.py) on a synthetic
    random vit_b checkpoint: set_image preprocessing, point-grid generation,
    batched predict, stability scores, box NMS ordering, RLE round-trip and
    record assembly (bbox xywh, area, point_coords, crop_box).

    Design choices that keep the comparison well-posed with random weights:

    * 1024x768 input — apply_image's resize is the identity at that size, so
      PIL-vs-ours resize differences (separately bounded in test_resize.py)
      are out of scope and both encoders see bit-identical pixels;
    * thresholds keep everything (pred_iou_thresh=-1e9, stability 0, NMS
      thresh 1.0) — random-weight scores sit anywhere, so any knife-edge
      threshold would make inclusion flip on 1e-3 numeric drift;
    * records are matched by (point, predicted_iou) sort on both sides, not
      by list position — keep-all NMS output order is an argsort over
      near-equal scores.

    Bounds are protocol-level (agreement/attribute closeness), not bitwise:
    the encoder legs run independently in torch vs JAX, and mask-threshold
    boundary pixels flip on ~1e-3 logit drift.  A structural bug (e.g. the
    round-3 pre-shuffle kernel flip, which mirrored every 4x4 block) sits
    far below every bound here."""
    torch = pytest.importorskip("torch")
    _install_torchvision_stub()
    sys.path.insert(0, "/root/reference")
    try:
        from segment_anything import sam_model_registry as ref_registry
        from segment_anything import SamAutomaticMaskGenerator as RefAMG
    finally:
        sys.path.remove("/root/reference")

    from samcarriestheburden_tpu import sam_model_registry
    from samcarriestheburden_tpu.engine.amg import SamAutomaticMaskGenerator

    torch.manual_seed(3)
    ref_sam = ref_registry["vit_b"](checkpoint=None)
    ref_sam.eval()
    ckpt = tmp_path / "sam_vit_b_synth.pth"
    torch.save(ref_sam.state_dict(), ckpt)

    kwargs = dict(points_per_side=4, points_per_batch=16,
                  pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                  box_nms_thresh=1.0, crop_n_layers=0, min_mask_region_area=0,
                  output_mode="binary_mask")
    ref_amg = RefAMG(ref_sam, **kwargs)
    our_amg = SamAutomaticMaskGenerator(sam_model_registry["vit_b"](ckpt),
                                        **kwargs)

    rng = np.random.default_rng(11)
    # smooth blobby image (tiled random upsample) — structured enough that
    # masks aren't pure noise, identical bytes into both pipelines
    small = rng.uniform(0, 255, (16, 12, 3))
    image = np.kron(small, np.ones((64, 64, 1))).astype(np.uint8)
    assert image.shape == (1024, 768, 3)

    with torch.no_grad():
        ref_recs = ref_amg.generate(image)
    our_recs = our_amg.generate(image)

    assert len(ref_recs) == len(our_recs) == 3 * 16  # keep-all: 3 masks/point

    def order(recs):
        key = [(r["point_coords"][0][0], r["point_coords"][0][1],
                r["predicted_iou"]) for r in recs]
        return [recs[i] for i in np.lexsort(np.asarray(key).T[::-1])]

    npx = image.shape[0] * image.shape[1]
    for rr, orc in zip(order(ref_recs), order(our_recs)):
        np.testing.assert_array_equal(rr["point_coords"], orc["point_coords"])
        assert rr["crop_box"] == orc["crop_box"] == [0, 0, 768, 1024]
        assert abs(rr["predicted_iou"] - orc["predicted_iou"]) < 5e-3
        assert abs(rr["stability_score"] - orc["stability_score"]) < 5e-3
        agree = np.mean(rr["segmentation"] == orc["segmentation"])
        assert agree > 0.98, f"mask agreement {agree}"
        assert abs(rr["area"] - orc["area"]) < 0.02 * npx
        np.testing.assert_allclose(rr["bbox"], orc["bbox"], atol=16)


@pytest.mark.slow
def test_export_model_vs_reference_torch(tmp_path):
    """The exported decoder program (export/stablehlo.make_decoder_fn) against
    the reference's SamOnnxModel (segment_anything/utils/onnx.py:17-144) run
    directly in torch — same synthetic vit_b weights, same inputs, decoder-only
    so it's cheap at full prompt-frame scale.  Covers the branch-free −1..3
    label embedding, the has_mask_input gate, the (num_points − 2.5)
    score-reweight single-mask selection, the stability-score replacement
    option, and resize_longest_image_size.

    Ours returns masks in the fixed 1024² frame + the pre-padded size (static
    XLA output shapes — documented difference); the consumer-side crop +
    bilinear resize to the original frame is applied here with torch's own
    F.interpolate, after which the outputs must match the reference's
    fully-postprocessed masks.  (``return_extra_metrics`` is not compared:
    the reference computes stability/area on the original frame, ours on the
    fixed frame — a documented consequence of static output shapes.)"""
    torch = pytest.importorskip("torch")
    _install_torchvision_stub()
    sys.path.insert(0, "/root/reference")
    try:
        from segment_anything import sam_model_registry as ref_registry
        from segment_anything.utils.onnx import SamOnnxModel
    finally:
        sys.path.remove("/root/reference")

    from samcarriestheburden_tpu import sam_model_registry
    from samcarriestheburden_tpu.export.stablehlo import make_decoder_fn

    torch.manual_seed(5)
    ref_sam = ref_registry["vit_b"](checkpoint=None)
    ref_sam.eval()
    ckpt = tmp_path / "sam_vit_b_synth.pth"
    torch.save(ref_sam.state_dict(), ckpt)
    model = sam_model_registry["vit_b"](ckpt)

    rng = np.random.default_rng(13)
    emb = rng.standard_normal((1, 256, 64, 64)).astype(np.float32)
    # pos point, neg point, box corners (labels 2/3), not-a-point pad (−1)
    coords = np.asarray([[[320.0, 275.5], [800.0, 150.0],
                          [100.0, 120.0], [900.0, 600.0],
                          [0.0, 0.0]]], np.float32)
    labels = np.asarray([[1, 0, 2, 3, -1]], np.int32)
    mask_in = (rng.standard_normal((1, 1, 256, 256)) * 4).astype(np.float32)
    orig = np.asarray([768, 512], np.int64)

    for single, stab, has_mask in [(True, False, 1.0), (False, False, 0.0),
                                   (True, True, 0.0)]:
        ref_onnx = SamOnnxModel(ref_sam, return_single_mask=single,
                                use_stability_score=stab)
        with torch.no_grad():
            r_up, r_scores, r_low = ref_onnx(
                torch.from_numpy(emb), torch.from_numpy(coords),
                torch.from_numpy(labels.astype(np.float32)),
                torch.from_numpy(mask_in),
                torch.tensor([has_mask]), torch.from_numpy(orig.astype(np.float32)))

        fn = make_decoder_fn(model, return_single_mask=single,
                             use_stability_score=stab)
        o_up, o_pre, o_scores, o_low = jax.jit(fn)(
            model.params, jnp.asarray(emb), jnp.asarray(coords),
            jnp.asarray(labels), jnp.asarray(mask_in),
            jnp.asarray([has_mask], jnp.float32),
            jnp.asarray(orig, jnp.int32))

        pre = np.asarray(o_pre)
        np.testing.assert_array_equal(
            pre, SamOnnxModel.resize_longest_image_size(
                torch.from_numpy(orig.astype(np.float32)), 1024).numpy())

        lscale = max(np.abs(r_low.numpy()).max(), 1.0)
        np.testing.assert_allclose(np.asarray(o_low), r_low.numpy(),
                                   atol=2e-3 * lscale)
        np.testing.assert_allclose(np.asarray(o_scores), r_scores.numpy(),
                                   atol=2e-3)

        # consumer-side finalisation of our fixed-frame masks
        crop = torch.from_numpy(np.asarray(o_up))[..., :pre[0], :pre[1]]
        o_final = torch.nn.functional.interpolate(
            crop, size=tuple(orig), mode="bilinear", align_corners=False)
        uscale = max(np.abs(r_up.numpy()).max(), 1.0)
        np.testing.assert_allclose(o_final.numpy(), r_up.numpy(),
                                   atol=2e-3 * uscale)


@pytest.mark.slow
def test_random_walk_vs_reference_torch():
    """Our on-device CG random walk against the reference's OWN graph
    construction + seeded solve (utils/random_walk.py:7-126) run end to end.
    The reference's native dependencies are substituted with strictly-better
    or separately-verified equivalents so its own code path executes:

    * ``pyamg.ruge_stuben_solver(...).solve(b, tol=1e-3)`` → an exact sparse
      direct solve (scipy splu) — pyamg only iterates toward the same
      solution, so exact is the fairest oracle;
    * ``utils.segmentation_preprocessing.erode_mask_with_disc_struct``
      (kornia, absent) → our ops.morphology implementation (disk SE,
      geodesic border) — oracle-tested vs scipy in test_morphology.py — so
      BOTH sides derive the background seeds identically and the comparison
      isolates the Laplacian weights, the seeded/unseeded split and the
      solve itself.

    This complements test_random_walk.py's hand-derived dense oracle: here
    the oracle is the reference source itself, so a misreading of its
    formulas (σ, λ, ε diagonal, neighbour structure) would be caught."""
    torch = pytest.importorskip("torch")
    import scipy.sparse.linalg as spla

    from samcarriestheburden_tpu.ops import morphology as M
    from samcarriestheburden_tpu.ops.random_walk import random_walk

    def _erode(mask_t, radius):
        out = np.asarray(M.erode_mask_with_disc_struct(
            jnp.asarray(mask_t.numpy()), radius=radius))
        return torch.from_numpy(out)

    pyamg_stub = types.ModuleType("pyamg")

    class _Solver:
        def __init__(self, SC):
            self._lu = spla.splu(SC.tocsc())

        def solve(self, b, tol=None):
            return self._lu.solve(b).astype(np.float32)

    pyamg_stub.ruge_stuben_solver = lambda SC, max_levels=6: _Solver(SC)

    segpre_stub = types.ModuleType("utils.segmentation_preprocessing")
    segpre_stub.erode_mask_with_disc_struct = _erode

    saved = {k: sys.modules.get(k)
             for k in ("pyamg", "utils", "utils.segmentation_preprocessing",
                       "utils.random_walk")}
    sys.modules["pyamg"] = pyamg_stub
    sys.modules["utils.segmentation_preprocessing"] = segpre_stub
    sys.path.insert(0, "/root/reference")
    try:
        import utils.random_walk as ref_rw
        ref_random_walk = ref_rw.random_walk
    finally:
        sys.path.remove("/root/reference")
        # don't leak a generically-named 'utils' package into other tests
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    rng = np.random.default_rng(17)
    # smooth blobby image: σ=10 edge weights need real structure, not noise
    small = rng.uniform(0, 255, (8, 6))
    img = np.kron(small, np.ones((6, 6))).astype(np.uint8)   # (48, 36)
    H, W = img.shape
    seg = np.zeros((3, H, W), bool)
    yy, xx = np.mgrid[:H, :W]
    for c, (cy, cx, r) in enumerate([(12, 10, 5), (30, 20, 6), (40, 8, 4)]):
        seg[c] = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2

    ref_p = ref_random_walk(torch.from_numpy(img),
                            torch.from_numpy(seg)).numpy()
    our_p = np.asarray(random_walk(jnp.asarray(img), jnp.asarray(seg),
                                   tol=1e-7, maxiter=4000))
    assert our_p.shape == ref_p.shape == (3, H, W)
    np.testing.assert_allclose(our_p, ref_p, atol=2e-3)


def _xmltodict_parse_stub(xml_string):
    """Minimal xmltodict.parse for the CVAT 'Image 1.1' schema: attributes
    as '@key', repeated children as lists, text content as '#text' (plain
    string when the element has no attributes/children)."""
    from xml.etree import ElementTree

    def conv(el):
        d = {"@" + k: v for k, v in el.attrib.items()}
        for c in el:
            v = conv(c)
            if c.tag in d:
                if not isinstance(d[c.tag], list):
                    d[c.tag] = [d[c.tag]]
                d[c.tag].append(v)
            else:
                d[c.tag] = v
        text = (el.text or "").strip()
        if text and not d:
            return text
        if text:
            d["#text"] = text
        return d if d else None

    root = ElementTree.fromstring(xml_string)
    return {root.tag: conv(root)}


@pytest.mark.slow
def test_cvat_parser_vs_reference_on_real_xmls():
    """Our CVAT parser against the reference's (utils/cvat_parser.py) on the
    REAL GrazPedWri annotation XMLs shipped in /root/reference/data — the one
    place real (non-synthetic) data exists in this environment.  Exercises
    the custom CVAT RLE decode + top/left placement on real '<mask>' elements
    (train2 has 34), real multi-polygon images, same-anatomy merging, the
    bone-mask option and 'Sonstiges' dropping.

    The reference's absent deps are stubbed: xmltodict with a faithful
    ElementTree conversion (above), and skimage.draw.polygon2mask with OUR
    rasteriser — so polygon interiors are rasterised identically on both
    sides by construction (our rasteriser's skimage semantics are covered
    structurally in test_data.py) and every OTHER behaviour (XML handling,
    RLE, placement, merge/flag logic, name mapping) must match EXACTLY."""
    from pathlib import Path

    ref_xml_dir = Path("/root/reference/data/cvat_annotation_xml")
    if not ref_xml_dir.exists():
        pytest.skip("reference data not mounted")

    from samcarriestheburden_tpu.data.cvat import (CVATParser, polygon2mask)

    xmltodict_stub = types.ModuleType("xmltodict")
    xmltodict_stub.parse = _xmltodict_parse_stub
    skimage_stub = types.ModuleType("skimage")
    skdraw_stub = types.ModuleType("skimage.draw")
    skdraw_stub.polygon2mask = lambda shape, poly: polygon2mask(
        shape, poly).astype(bool)
    skimage_stub.draw = skdraw_stub

    saved = {k: sys.modules.get(k)
             for k in ("xmltodict", "skimage", "skimage.draw",
                       "utils", "utils.cvat_parser")}
    sys.modules["xmltodict"] = xmltodict_stub
    sys.modules["skimage"] = skimage_stub
    sys.modules["skimage.draw"] = skdraw_stub
    sys.path.insert(0, "/root/reference")
    try:
        import utils.cvat_parser as ref_cvat
        RefParser = ref_cvat.CVATParser
    finally:
        sys.path.remove("/root/reference")
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    xml = ref_xml_dir / "annotations_train2.xml"
    ref = RefParser(str(xml), True, False, True)
    ours = CVATParser(xml, True, False, True)
    assert ours.available_file_names == ref.available_file_names

    # pick real coverage: images carrying '<mask>' (RLE) elements + the
    # first polygon-only ones (full-image rasterisation is slow on one core)
    rle_names = [img["@name"].split(".")[0] for img in ref.img_dicts
                 if "mask" in img]
    assert len(rle_names) >= 3, "expected RLE masks in train2"
    names = rle_names[:3] + [n for n in ref.available_file_names
                             if n not in rle_names][:2]

    for name in names:
        ref_masks = {m.anatomy: m.mask for m in ref.extract_masks(name)}
        our_masks = {m.anatomy: m.mask for m in ours.extract_masks(name)}
        assert list(our_masks) == list(ref_masks), name
        for anatomy, rm in ref_masks.items():
            assert rm.dtype == our_masks[anatomy].dtype == np.uint8
            np.testing.assert_array_equal(our_masks[anatomy], rm,
                                          err_msg=f"{name}/{anatomy}")

    # bone-mask + keep-Sonstiges flags on one image
    ref_b = RefParser(str(xml), True, True, False)
    our_b = CVATParser(xml, True, True, False)
    rb = {m.anatomy: m.mask for m in ref_b.extract_masks(names[0])}
    ob = {m.anatomy: m.mask for m in our_b.extract_masks(names[0])}
    assert "Ossis" in rb and list(ob) == list(rb)
    np.testing.assert_array_equal(ob["Ossis"], rb["Ossis"])
