import numpy as np

from samcarriestheburden_tpu.ops import rle as RLE


def test_roundtrip(rng):
    masks = rng.random((4, 13, 9)) > 0.5
    encs = RLE.mask_to_rle(masks)
    for enc, mask in zip(encs, masks):
        assert enc["size"] == [13, 9]
        np.testing.assert_array_equal(RLE.rle_to_mask(enc), mask)


def test_all_zero_and_all_one():
    z = np.zeros((1, 4, 4), bool)
    enc = RLE.mask_to_rle(z)[0]
    assert enc["counts"] == [16]
    np.testing.assert_array_equal(RLE.rle_to_mask(enc), z[0])
    o = np.ones((1, 4, 4), bool)
    enc = RLE.mask_to_rle(o)[0]
    assert enc["counts"] == [0, 16]
    np.testing.assert_array_equal(RLE.rle_to_mask(enc), o[0])


def test_fortran_order():
    m = np.zeros((2, 3), bool)
    m[0, 1] = True  # column-major position = 2
    enc = RLE.mask_to_rle(m[None])[0]
    assert enc["counts"] == [2, 1, 3]


def test_area(rng):
    masks = rng.random((3, 10, 10)) > 0.3
    for enc, mask in zip(RLE.mask_to_rle(masks), masks):
        assert RLE.area_from_rle(enc) == mask.sum()


def test_coco_roundtrip(rng):
    masks = rng.random((2, 20, 15)) > 0.5
    for enc in RLE.mask_to_rle(masks):
        coco = RLE.coco_encode_rle(enc)
        assert isinstance(coco["counts"], str)
        dec = RLE.coco_decode_rle(coco)
        assert dec["counts"] == enc["counts"]
        np.testing.assert_array_equal(RLE.rle_to_mask(dec), RLE.rle_to_mask(enc))
