"""Native C++ host kernels vs the numpy/scipy oracles."""

import numpy as np
import pytest
from scipy import ndimage

from samcarriestheburden_tpu import native
from samcarriestheburden_tpu.ops import rle as RLE

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no C++ toolchain available")


def test_rle_encode_matches_numpy(rng):
    masks = rng.random((5, 37, 23)) > 0.5
    native_out = RLE.mask_to_rle(masks, use_native=True)
    numpy_out = RLE.mask_to_rle(masks, use_native=False)
    for a, b in zip(native_out, numpy_out):
        assert a == b


def test_rle_decode_roundtrip(rng):
    mask = rng.random((19, 31)) > 0.6
    counts = native.rle_encode(mask)
    decoded = native.rle_decode(counts, 19, 31)
    np.testing.assert_array_equal(decoded, mask)


def test_rle_edge_cases():
    z = np.zeros((4, 4), bool)
    assert native.rle_encode(z) == [16]
    o = np.ones((4, 4), bool)
    assert native.rle_encode(o) == [0, 16]


def test_ccl_matches_scipy(rng):
    mask = rng.random((64, 48)) > 0.7
    labels, areas = native.connected_components_with_areas(mask)
    scipy_lbl, n_scipy = ndimage.label(mask, structure=np.ones((3, 3)))
    assert len(areas) - 1 == n_scipy
    # one-to-one label correspondence
    for comp in range(1, n_scipy + 1):
        ours = labels[scipy_lbl == comp]
        assert len(np.unique(ours)) == 1 and ours[0] > 0
    # areas consistent
    for lbl in range(1, len(areas)):
        assert areas[lbl] == (labels == lbl).sum()
    assert areas[0] == (~mask).sum()


def test_remove_small_regions_uses_native(rng):
    from samcarriestheburden_tpu.ops.regions import remove_small_regions

    mask = np.zeros((32, 32), bool)
    mask[2:20, 2:20] = True
    mask[25:27, 25:27] = True  # small island
    out, changed = remove_small_regions(mask, area_thresh=10, mode="islands")
    assert changed and not out[25, 25] and out[10, 10]

    holey = mask.copy()
    holey[10:12, 10:12] = False  # small hole
    out, changed = remove_small_regions(holey, area_thresh=10, mode="holes")
    assert changed and out[10, 10]
