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
