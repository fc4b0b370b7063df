"""Data layer: CVAT parsing (against the real reference XMLs) and the dataset
classes over a synthetic data root."""

from pathlib import Path

import numpy as np
import pytest

from samcarriestheburden_tpu.config import BONE_LABEL
from samcarriestheburden_tpu.data.cvat import CVATParser, polygon2mask, rle2mask
from samcarriestheburden_tpu.data.datasets import (
    LightSegGrazPedWriDataset, SavedSegGrazPedWriDataset)
from samcarriestheburden_tpu.data.h5io import MaskWriter

REF_XML = Path("/root/reference/data/cvat_annotation_xml")


def test_rle2mask_roundtrip():
    mask = rle2mask([3, 2, 5], width=5, height=2)
    np.testing.assert_array_equal(mask.reshape(-1), [0, 0, 0, 1, 1, 0, 0, 0, 0, 0])


def test_polygon2mask_square():
    poly = np.array([[2.0, 2.0], [2.0, 8.0], [8.0, 8.0], [8.0, 2.0]])
    m = polygon2mask((12, 12), poly)
    assert m[5, 5] == 1 and m[0, 0] == 0 and m[10, 10] == 0
    # skimage semantics checked structurally: interior filled, area plausible
    assert 25 <= m.sum() <= 49


@pytest.mark.skipif(not REF_XML.exists(), reason="reference data not mounted")
def test_parse_reference_val_xml():
    parser = CVATParser([REF_XML / "annotations_val.xml"], True, False, True)
    names = parser.available_file_names
    assert len(names) == 12
    masks = parser.extract_masks(names[0])
    anatomies = {m.anatomy for m in masks}
    # the XMLs also annotate phalanges etc.; the dataset layer keeps only the
    # 17 BONE_LABEL classes — here just check those are present
    assert {"Radius", "Ulna", "Os capitatum"} <= anatomies
    assert all(m.mask.dtype == np.uint8 for m in masks)
    assert all(m.mask.sum() > 0 for m in masks)


@pytest.mark.skipif(not REF_XML.exists(), reason="reference data not mounted")
def test_parse_all_reference_xmls():
    xmls = sorted(REF_XML.glob("annotations_*.xml"))
    parser = CVATParser(xmls, True, False, True)
    assert len(parser.available_file_names) == 12 + 31 + 29 + 12


def test_light_dataset(data_root):
    ds = LightSegGrazPedWriDataset("train", data_root=data_root)
    assert len(ds) == 3
    x, y, name = ds[0]
    assert x.shape == (1, 384, 224) and y.shape == (17, 384, 224)
    assert 0 <= x.min() and x.max() <= 1
    radius_idx = ds.BONE_LABEL_MAPPING["Radius"]
    assert y[radius_idx].sum() > 0
    assert y[ds.BONE_LABEL_MAPPING["Os lunatum"]].sum() == 0  # unannotated class
    xs, ys, names = ds.as_arrays()
    assert xs.shape == (3, 1, 384, 224)


def test_light_dataset_subset_and_flip(data_root):
    ds = LightSegGrazPedWriDataset("train", number_training_samples=2,
                                   data_root=data_root)
    assert len(ds) == 2
    # img001 has laterality R: GT must be flipped relative to img000's
    ds_all = LightSegGrazPedWriDataset("train", data_root=data_root)
    y0 = ds_all[0][1]
    y1 = ds_all[1][1]
    r = ds_all.BONE_LABEL_MAPPING["Radius"]
    np.testing.assert_array_equal(y1[r], y0[r][:, ::-1])


def test_val_dataset(data_root):
    ds = LightSegGrazPedWriDataset("val", data_root=data_root)
    assert len(ds) == 1


def test_saved_dataset(data_root):
    rng = np.random.default_rng(1)
    h5 = data_root / "masks.h5"
    with MaskWriter(h5) as w:
        w.write("img005", (rng.random((17, 200, 120)) > 0.8).astype(np.uint8),
                estimated_dice=rng.random(17).astype(np.float32))
    ds = SavedSegGrazPedWriDataset(h5, use_500_split=True, data_root=data_root)
    assert len(ds) == 1
    x, y, name = ds[0]
    assert name == "img005"
    assert x.shape == (1, 384, 224) and y.shape == (17, 384, 224)


def _write_pseudo_h5(path, stems, dice_by_stem=None):
    """Refined-mask h5 in the save_refined_segmentations schema: per-image
    (17,H,W) uint8 masks + per-class estimated_dice attr."""
    rng = np.random.default_rng(2)
    with MaskWriter(path) as w:
        for s in stems:
            est = np.full(17, dice_by_stem.get(s, 0.9) if dice_by_stem else 0.9,
                          np.float32)
            w.write(s, (rng.random((17, 200, 120)) > 0.8).astype(np.uint8),
                    estimated_dice=est)
    return path


def test_combined_dataset(data_root):
    """CombinedSegGrazPedWriDataset pairs each GT sample with a RANDOM
    pseudo-label sample (reference seg_grazpedwri_dataset.py:202-229)."""
    import random

    from samcarriestheburden_tpu.data.datasets import \
        CombinedSegGrazPedWriDataset

    h5 = _write_pseudo_h5(data_root / "pseudo.h5", ["img005"])
    ds_gt = LightSegGrazPedWriDataset("train", data_root=data_root)
    ds_pl = SavedSegGrazPedWriDataset(h5, use_500_split=True,
                                      data_root=data_root)
    ds = CombinedSegGrazPedWriDataset(ds_gt, ds_pl)
    assert len(ds) == len(ds_gt) == 3  # length is the GT split's

    random.seed(0)
    for i in range(len(ds)):
        item = ds[i]
        assert set(item) == {"gt", "pseudo_lbl"}
        xg, yg, ng = item["gt"]
        # the gt leg is exactly ds_with_gt[index]
        xr, yr, nr = ds_gt[i]
        assert ng == nr
        np.testing.assert_array_equal(yg, yr)
        xp, yp, np_name = item["pseudo_lbl"]
        assert np_name in ds_pl.available_file_names
        assert xp.shape == (1, 384, 224) and yp.shape == (17, 384, 224)
    # class constants are propagated like every other dataset
    assert ds.N_CLASSES == 17 and len(ds.BONE_LABEL_MAPPING) == 17


def test_mean_teacher_dataset_split_and_ordering(data_root):
    """Labelled ∪ unlabelled union: GT names first (GT items carry masks),
    then the 500-split unlabelled names (mask is None); reference :232-292."""
    from samcarriestheburden_tpu.data.datasets import \
        MeanTeacherSegGrazPedWriDataset

    ds = MeanTeacherSegGrazPedWriDataset(use_500_split=True,
                                         data_root=data_root)
    # 3 annotated train stems + 1 stem in 500unlabeled_sample.csv
    assert len(ds) == 4
    assert ds.available_file_names[:3] == ds.ds_with_gt.available_file_names
    assert ds.available_file_names[3] == "img005"
    for i in range(3):
        x, y, name = ds[i]
        assert y is not None and y.shape == (17, 384, 224)
    x, y, name = ds[3]
    assert name == "img005" and y is None
    assert x.shape == (1, 384, 224) and 0 <= x.min() and x.max() <= 1
    assert not ds.use_pseudo_label


def test_mean_teacher_dataset_glob_split_excludes_gt(data_root):
    """use_500_split=False globs every PNG and removes the GT stems; the
    labelled/unlabelled sets must stay disjoint (reference :253-259)."""
    from samcarriestheburden_tpu.data.datasets import \
        MeanTeacherSegGrazPedWriDataset

    ds = MeanTeacherSegGrazPedWriDataset(use_500_split=False,
                                         data_root=data_root)
    # 6 PNGs total - 3 GT train stems = 3 unlabelled
    assert len(ds) == 6
    assert set(ds.unlabeled_files_names) == {"img003", "img004", "img005"}
    assert not (set(ds.unlabeled_files_names)
                & set(ds.ds_with_gt.available_file_names))


def test_mean_teacher_duplicate_split_rejected(data_root):
    """A 500-split CSV that lists a GT stem trips the exclusivity assert."""
    import pandas as pd

    from samcarriestheburden_tpu.data.datasets import \
        MeanTeacherSegGrazPedWriDataset

    pd.DataFrame({"filestem": ["img000", "img005"]}).to_csv(
        data_root / "500unlabeled_sample.csv")
    with pytest.raises(AssertionError, match="duplicated"):
        MeanTeacherSegGrazPedWriDataset(use_500_split=True,
                                        data_root=data_root)


def test_mean_teacher_missing_pseudo_file_rejected(data_root):
    from samcarriestheburden_tpu.data.datasets import \
        MeanTeacherSegGrazPedWriDataset

    with pytest.raises(AssertionError, match="Pseudo label file does not exist"):
        MeanTeacherSegGrazPedWriDataset(
            use_500_split=True, model_id_pseudo_label="nope",
            dsc_agreement_threshold=0.8, data_root=data_root)


def test_mean_teacher_pseudo_label_path_from_select_cli(data_root):
    """End-to-end Dice-threshold pseudo-label path: a refined-mask h5 with
    per-image estimated Dice → cli/select_pseudo_labels filters it → the
    mean-teacher dataset serves the SELECTED pseudo labels for unlabelled
    stems above the threshold and plain images for the rest (reference
    seg_grazpedwri_dataset.py:266-292; the selection artifact name
    selected_pseudo_labels_500_dsc_<thr>.h5 is the reference's contract)."""
    import pandas as pd

    from samcarriestheburden_tpu.cli import select_pseudo_labels
    from samcarriestheburden_tpu.data.datasets import \
        MeanTeacherSegGrazPedWriDataset

    # two unlabelled stems: img005 confident, img003 below threshold
    pd.DataFrame({"filestem": ["img003", "img005"]}).to_csv(
        data_root / "500unlabeled_sample.csv")
    mdir = data_root / "seg_masks" / "model_a"
    mdir.mkdir(parents=True)
    refined = _write_pseudo_h5(mdir / "sam_box_500.h5",
                               ["img003", "img005"],
                               dice_by_stem={"img003": 0.3, "img005": 0.95})

    out = select_pseudo_labels.main([
        "--model_id", "model_a", "--input", str(refined),
        "--threshold", "0.8", "--data_root", str(data_root)])
    assert out.name == "selected_pseudo_labels_500_dsc_08.h5"

    ds = MeanTeacherSegGrazPedWriDataset(
        use_500_split=True, model_id_pseudo_label="model_a",
        dsc_agreement_threshold=0.8, data_root=data_root)
    assert ds.use_pseudo_label
    assert ds.ds_with_pseudo_lbl.available_file_names == ["img005"]
    by_name = {ds[i][2]: ds[i] for i in range(len(ds))}
    assert by_name["img005"][1] is not None, "selected pseudo label served"
    assert by_name["img005"][1].shape == (17, 384, 224)
    assert by_name["img003"][1] is None, "below-threshold stem stays unlabelled"
    # GT stems still come from the annotated split, not the pseudo file
    assert by_name["img000"][1].shape == (17, 384, 224)


def test_make_synthetic_dataset_is_loadable(tmp_path, monkeypatch):
    """The synthetic-data generator produces a data root the dataset classes
    load end-to-end, with all 17 classes present (out-of-box pipeline)."""
    from samcarriestheburden_tpu.cli import make_synthetic_dataset as gen
    from samcarriestheburden_tpu.data.datasets import LightSegGrazPedWriDataset

    root = gen.main(["--data_root", str(tmp_path / "data"), "--n_train1", "2",
                     "--n_train2", "1", "--n_val", "1", "--n_test", "1",
                     "--n_unlabeled", "2", "--height", "220", "--width", "140"])
    ds = LightSegGrazPedWriDataset("train", data_root=root)
    x, y, stems = ds.as_arrays()
    assert x.shape == (3, 1, 384, 224) and y.shape == (3, 17, 384, 224)
    assert (y.sum(axis=(0, 2, 3)) > 0).all(), "all 17 classes must appear"
    assert (root / "500unlabeled_sample.csv").exists()
    assert (root / "successively_training_files_order.csv").exists()
