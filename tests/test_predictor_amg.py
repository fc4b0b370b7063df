"""SamPredictor and SamAutomaticMaskGenerator over the tiny golden SAM."""

from pathlib import Path

import numpy as np
import pytest

from samcarriestheburden_tpu.config import sam_vit_t_config
from samcarriestheburden_tpu.engine.amg import MaskData, SamAutomaticMaskGenerator
from samcarriestheburden_tpu.engine.predictor import SamPredictor
from samcarriestheburden_tpu.models import convert
from samcarriestheburden_tpu.models.sam import SamModel

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def model():
    data = np.load(GOLDEN / "sam_e2e.npz")
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return SamModel(cfg=sam_vit_t_config(),
                    params=convert.sam_params_from_torch(sd, sam_vit_t_config()))


@pytest.fixture(scope="module")
def image(model):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (200, 256, 3)).astype(np.uint8)
    img[60:140, 80:180] = 240  # bright blob
    return img


def test_predictor_flow(model, image):
    pred = SamPredictor(model)
    with pytest.raises(RuntimeError):
        pred.predict(box=np.array([0, 0, 10, 10]))
    pred.set_image(image)
    assert pred.original_size == (200, 256)
    assert pred.input_size == (100, 128)  # longest side -> 128
    emb = pred.get_image_embedding()
    assert emb.shape == (1, 16, 8, 8)

    masks, iou, low_res = pred.predict(
        point_coords=np.array([[128.0, 100.0]]), point_labels=np.array([1]),
        box=np.array([80.0, 60.0, 180.0, 140.0]), multimask_output=False)
    assert masks.shape == (1, 200, 256) and masks.dtype == bool
    assert iou.shape == (1,)
    assert low_res.shape == (1, 32, 32)

    multi, iou3, _ = pred.predict(point_coords=np.array([[128.0, 100.0]]),
                                  point_labels=np.array([1]))
    assert multi.shape == (3, 200, 256) and iou3.shape == (3,)

    logits, _, low = pred.predict(point_coords=np.array([[128.0, 100.0]]),
                                  point_labels=np.array([1]),
                                  multimask_output=False, return_logits=True)
    assert logits.dtype != bool
    # mask-input round 2
    m2, _, _ = pred.predict(point_coords=np.array([[128.0, 100.0]]),
                            point_labels=np.array([1]), mask_input=low,
                            multimask_output=False)
    assert m2.shape == (1, 200, 256)

    pred.reset_image()
    assert not pred.is_image_set


def test_predictor_bgr(model, image):
    pred = SamPredictor(model)
    pred.set_image(image[..., ::-1], image_format="BGR")
    feats_bgr = np.asarray(pred.get_image_embedding())
    pred.set_image(image, image_format="RGB")
    feats_rgb = np.asarray(pred.get_image_embedding())
    np.testing.assert_allclose(feats_bgr, feats_rgb, atol=1e-5)


def test_mask_data_container():
    d = MaskData(a=np.arange(5), b=list("abcde"))
    d.filter(np.array([True, False, True, False, True]))
    assert d["a"].tolist() == [0, 2, 4] and d["b"] == ["a", "c", "e"]
    d2 = MaskData(a=np.arange(2), b=list("xy"))
    d.cat(d2)
    assert len(d) == 5
    with pytest.raises(AssertionError):
        MaskData(bad=3)


def test_amg_generate(model, image):
    gen = SamAutomaticMaskGenerator(model, points_per_side=4,
                                    pred_iou_thresh=-10.0,
                                    stability_score_thresh=0.0,
                                    box_nms_thresh=0.9)
    records = gen.generate(image)
    assert len(records) > 0
    rec = records[0]
    assert rec["segmentation"].shape == (200, 256)
    assert rec["segmentation"].dtype == bool
    assert len(rec["bbox"]) == 4 and len(rec["crop_box"]) == 4
    assert isinstance(rec["predicted_iou"], float)
    assert rec["area"] == rec["segmentation"].sum()


def test_amg_output_modes(model, image):
    gen = SamAutomaticMaskGenerator(model, points_per_side=2,
                                    pred_iou_thresh=-10.0,
                                    stability_score_thresh=0.0,
                                    output_mode="uncompressed_rle")
    recs = gen.generate(image)
    if recs:
        assert "counts" in recs[0]["segmentation"]

    gen_coco = SamAutomaticMaskGenerator(model, points_per_side=2,
                                         pred_iou_thresh=-10.0,
                                         stability_score_thresh=0.0,
                                         output_mode="coco_rle")
    recs = gen_coco.generate(image)
    if recs:
        assert isinstance(recs[0]["segmentation"]["counts"], str)


def test_amg_crops_and_small_regions(model, image):
    gen = SamAutomaticMaskGenerator(model, points_per_side=2,
                                    pred_iou_thresh=-10.0,
                                    stability_score_thresh=0.0,
                                    crop_n_layers=1, min_mask_region_area=10)
    records = gen.generate(image)
    assert isinstance(records, list)


def test_amg_strict_thresholds_filter_everything(model, image):
    gen = SamAutomaticMaskGenerator(model, points_per_side=2,
                                    pred_iou_thresh=100.0)
    assert gen.generate(image) == []
