"""Integration tests for the decoder head + refinement engine over a tiny SAM
and a synthetic embeddings h5.  The batched all-class path is cross-checked
against the reference's per-class sequential protocol implemented through the
same public ``predict_mask`` API."""

from pathlib import Path

import numpy as np
import pytest

from samcarriestheburden_tpu.config import sam_vit_t_config
from samcarriestheburden_tpu.data.h5io import EmbeddingReader, EmbeddingWriter
from samcarriestheburden_tpu.engine.decoder_head import SamMaskDecoderHead
from samcarriestheburden_tpu.engine.prompts import PromptExtractor
from samcarriestheburden_tpu.engine.refinement import (
    RndWalkSegRefiner, SamSegRefiner, SegEnhance)
from samcarriestheburden_tpu.models import convert
from samcarriestheburden_tpu.ops.resize import resize_nearest

GOLDEN = Path(__file__).parent / "golden"
CFG = sam_vit_t_config()
SEG_HW = (64, 48)
INPUT_SIZE = (128, 75)     # resize-longest-side of ORIGINAL below to 128
ORIGINAL_SIZE = (256, 150)


def _load_params():
    data = np.load(GOLDEN / "sam_e2e.npz")
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return {
        "prompt_encoder": convert.prompt_encoder_params_from_torch(sd),
        "mask_decoder": convert.mask_decoder_params_from_torch(sd, CFG.mask_decoder),
    }


@pytest.fixture(scope="module")
def head(tmp_path_factory):
    rng = np.random.default_rng(3)
    h5 = tmp_path_factory.mktemp("emb") / "emb.h5"
    with EmbeddingWriter(h5, checkpoint_name="tiny.npz", img_encoder_img_size=128) as w:
        for stem in ["img_a", "img_b"]:
            w.write(stem, rng.standard_normal((1, 16, 8, 8)).astype(np.float32),
                    ORIGINAL_SIZE, INPUT_SIZE)
    return SamMaskDecoderHead(None, "vit_t", h5, params=_load_params())


def _seg_probs():
    rng = np.random.default_rng(5)
    seg = np.zeros((3, *SEG_HW), np.float32)
    seg[0, 10:25, 8:20] = 0.9
    seg[1, 35:50, 15:35] = 0.8
    seg[1, 5:8, 40:44] = 0.6  # second component, smaller
    # class 2 empty
    return seg


def test_decoder_head_predict_mask(head):
    seg = _seg_probs() > 0.5
    prompts = PromptExtractor(seg).extract()
    p = prompts[0]
    masks, iou, low_res = head.predict_mask("img_a", p, ["box"])
    assert masks.shape == (1, 1, *ORIGINAL_SIZE) and masks.dtype == bool
    assert low_res.shape == (1, 1, 32, 32)
    assert iou.shape == (1, 1)
    # second round with mask input works
    masks2, iou2, _ = head.predict_mask("img_a", p, ["pos_points", "neg_points"],
                                        mask_prev_iter=low_res)
    assert masks2.shape == masks.shape


def test_refiner_batched_matches_sequential_reference_protocol(head):
    seg = _seg_probs()
    refiner = SamSegRefiner(head, prompts2use=[["box"], ["pos_points", "neg_points"]])
    refined, est_dice = refiner.refine(seg, "img_a")
    refined = np.asarray(refined)
    est_dice = np.asarray(est_dice)
    assert refined.shape == (3, *SEG_HW) and refined.dtype == bool
    assert np.isfinite(est_dice[:2]).all() and np.isnan(est_dice[2])
    # empty class untouched
    assert refined[2].sum() == 0

    # sequential reference protocol via the public per-class API
    bool_seg = seg.astype(bool)
    prompts = PromptExtractor(bool_seg).extract()
    for p in prompts:
        masks, iou, low_res = head.predict_mask("img_a", p, ["box"])
        masks, iou, _ = head.predict_mask("img_a", p, ["pos_points", "neg_points"],
                                          mask_prev_iter=low_res)
        resized = np.asarray(resize_nearest(
            masks.astype(np.float32), SEG_HW, exact=True))[0, 0] > 0.5
        agree = (resized == refined[p.class_idx]).mean()
        assert agree > 0.99, f"class {p.class_idx}: agreement {agree}"
        expected_dice = 2 * float(iou[0, 0]) / (1 + float(iou[0, 0]))
        np.testing.assert_allclose(est_dice[p.class_idx], expected_dice, atol=1e-3)


def test_seg_enhance_pipeline(head):
    seg = _seg_probs()
    refiner = SamSegRefiner(head, prompts2use=["box"])
    enh = SegEnhance(refiner, "highest_probability", "dilation", "square", 8, "cpu")
    refined, est_dice = enh.enhance(seg, "img_a")
    assert np.asarray(refined).shape == (3, *SEG_HW)
    # morphology only fills the reference's side buffer
    assert enh.last_preprocessed_seg is not None
    assert np.asarray(enh.last_preprocessed_seg).shape == (3, *SEG_HW)


def test_enhance_batch_matches_per_image(head):
    """The single-dispatch image-batched sweep path == the per-image loop."""
    rng = np.random.default_rng(11)
    segs = np.stack([_seg_probs(),
                     np.clip(_seg_probs()
                             + rng.uniform(-0.2, 0.2, (3, *SEG_HW)), 0, 1)
                     .astype(np.float32)])
    names = ["img_a", "img_b"]
    refiner = SamSegRefiner(head, prompts2use=[["box"],
                                               ["pos_points", "neg_points"]])
    enh = SegEnhance(refiner, "highest_probability", "dilation", "square", 8)
    seq = [enh.enhance(s, n) for s, n in zip(segs, names)]
    got_r, got_d = enh.enhance_batch(segs, names)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(got_r[i]),
                                      np.asarray(seq[i][0]))
        np.testing.assert_allclose(np.asarray(got_d[i]),
                                   np.asarray(seq[i][1]), atol=1e-5)
    assert np.asarray(enh.last_preprocessed_seg).shape == (2, 3, *SEG_HW)


def test_seg_enhance_identity_morph(head):
    refiner = SamSegRefiner(head, prompts2use=["box"])
    enh = SegEnhance(refiner, None, "erosion", "square", 0, "cpu")
    seg = _seg_probs()
    refined, _ = enh.enhance(seg, "img_b")
    np.testing.assert_allclose(np.asarray(enh.last_preprocessed_seg), seg)


def test_random_walk_refiner(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    img = np.full((128, 96), 40, np.uint8)
    img[30:70, 20:60] = 200  # bright object
    cv2.imwrite(str(img_dir / "x.png"), img)

    seg = np.zeros((1, 64, 48), bool)
    seg[0, 20:30, 15:25] = True  # seed inside the object (image will be resized)
    refiner = RndWalkSegRefiner(background_erosion_radius=3, laplace_sigma=10,
                                img_path=img_dir)
    y_hat, est = refiner.refine(seg, "x")
    y_hat = np.asarray(y_hat)
    assert est is None
    assert y_hat.shape == (1, 64, 48)
    # seeds stay labelled; the walk expands within the bright region
    assert y_hat[0, 22, 18]
    assert y_hat[0].sum() >= seg[0].sum()


def test_batched_decode_logits_match_sequential(head):
    """Logit-level contract (stronger than the 0.99 mask-agreement check):
    the batched all-class decode — same prompt assembly the jitted
    _refine_batched uses — reproduces the sequential per-class predict_mask
    low-res logits to fp tolerance, both rounds of the 2-round protocol."""
    import jax.numpy as jnp

    from samcarriestheburden_tpu.engine.prompts import (
        extract_prompt_arrays, neg_seed_table)

    seg = _seg_probs()
    bool_seg = seg.astype(bool)
    original_size, input_size = head.sizes("img_a")
    input_size = jnp.asarray(input_size)

    arrays = extract_prompt_arrays(jnp.asarray(bool_seg))
    neg_table, neg_valid = neg_seed_table(arrays["pos_seeds"], arrays["pos_valid"])
    g4 = head.cfg.prompt_encoder.image_embedding_size[0] * 4
    c = bool_seg.shape[0]

    coords1, labels1 = SamSegRefiner._build_prompts(
        arrays, neg_table, neg_valid, ["box"], SEG_HW, input_size)
    low1_b, iou1_b = head._decode(head.features("img_a"), coords1, labels1,
                                  jnp.zeros((c, 1, g4, g4), jnp.float32),
                                  jnp.zeros((c,), bool))
    coords2, labels2 = SamSegRefiner._build_prompts(
        arrays, neg_table, neg_valid, ["pos_points", "neg_points"],
        SEG_HW, input_size)
    low2_b, iou2_b = head._decode(head.features("img_a"), coords2, labels2,
                                  low1_b, jnp.ones((c,), bool))

    for p in PromptExtractor(bool_seg).extract():
        _, iou1_s, low1_s = head.predict_mask("img_a", p, ["box"])
        _, iou2_s, low2_s = head.predict_mask(
            "img_a", p, ["pos_points", "neg_points"], mask_prev_iter=low1_s)
        i = p.class_idx
        np.testing.assert_allclose(np.asarray(low1_b[i]), np.asarray(low1_s[0]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(iou1_b[i]), np.asarray(iou1_s[0]),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(low2_b[i]), np.asarray(low2_s[0]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(iou2_b[i]), np.asarray(iou2_s[0]),
                                   atol=2e-5)


def test_decoder_image_shared_matches_broadcast():
    """The shared-image layer-0 decoder path (refinement round 1 / AMG) is
    the same math as broadcasting the image rows across the prompt batch:
    identical projections, attention folded over the class axis with shared
    k/v.  Logits must agree to fp tolerance."""
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu.models import mask_decoder, prompt_encoder

    cfg = sam_vit_t_config()
    key = jax.random.PRNGKey(0)
    kd, kp, kf, kc = jax.random.split(key, 4)
    dec_p = mask_decoder.init(kd, cfg.mask_decoder)
    pe_p = prompt_encoder.init(kp, cfg.prompt_encoder)
    g = cfg.prompt_encoder.image_embedding_size[0]
    c = cfg.mask_decoder.transformer_dim
    b, n = 5, 3

    features = jax.random.normal(kf, (1, c, g, g), jnp.float32)
    coords = jax.random.uniform(kc, (b, n, 2), jnp.float32) * 64
    labels = jnp.tile(jnp.asarray([[1, 0, -1]], jnp.int32), (b, 1))
    sparse = prompt_encoder.embed_unified_points(pe_p, cfg.prompt_encoder,
                                                 coords, labels)
    image_pe = prompt_encoder.get_dense_pe(pe_p, cfg.prompt_encoder)
    dense1 = prompt_encoder.no_mask_dense(pe_p, cfg.prompt_encoder, 1)
    denseb = jnp.broadcast_to(dense1, (b,) + dense1.shape[1:])

    ref_masks, ref_iou = mask_decoder.apply(
        dec_p, cfg.mask_decoder, features, image_pe, sparse, denseb, False)
    sh_masks, sh_iou = mask_decoder.apply(
        dec_p, cfg.mask_decoder, features, image_pe, sparse, dense1, False,
        image_shared=True)
    np.testing.assert_allclose(np.asarray(sh_masks), np.asarray(ref_masks),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sh_iou), np.asarray(ref_iou),
                               atol=1e-4, rtol=1e-4)
