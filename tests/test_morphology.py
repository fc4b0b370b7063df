import numpy as np
import pytest
from scipy import ndimage

from samcarriestheburden_tpu.ops import morphology as Mo


def test_square_is_width():
    assert Mo.square(8).shape == (8, 8)
    assert Mo.square(8).sum() == 64
    assert Mo.get_struct_element("square", 0).shape == (1, 1)  # identity special case


def test_disk_diamond():
    d = Mo.disk(2)
    assert d.shape == (5, 5)
    assert d[2, 2] == 1 and d[0, 0] == 0 and d[0, 2] == 1
    dm = Mo.diamond(2)
    assert dm.shape == (5, 5)
    assert dm.sum() == 13


def test_star():
    s1 = Mo.star(1)
    np.testing.assert_array_equal(s1, np.ones((3, 3)))
    s3 = Mo.star(3)
    m, n = 7, 1
    assert s3.shape == (m + 2 * n, m + 2 * n)
    assert s3[0, 0] == 0 and s3[4, 4] == 1
    # symmetric under 90° rotation and transpose
    np.testing.assert_array_equal(s3, np.rot90(s3))
    np.testing.assert_array_equal(s3, s3.T)


@pytest.mark.parametrize("se_name,radius", [("disk", 3), ("diamond", 2), ("square", 5)])
def test_dilation_matches_scipy(rng, se_name, radius):
    mask = (rng.random((2, 32, 32)) > 0.8).astype(np.float32)
    k = Mo.get_struct_element(se_name, radius)
    ours = np.asarray(Mo.dilation(mask, k))
    for c in range(2):
        # odd-sized symmetric SE, origin at center == scipy default
        expected = ndimage.binary_dilation(mask[c] > 0.5, structure=k.astype(bool))
        np.testing.assert_array_equal(ours[c] > 0.5, expected)


@pytest.mark.parametrize("se_name,radius", [("disk", 3), ("diamond", 2)])
def test_erosion_matches_scipy(rng, se_name, radius):
    mask = (rng.random((1, 32, 32)) > 0.3).astype(np.float32)
    k = Mo.get_struct_element(se_name, radius)
    ours = np.asarray(Mo.erosion(mask, k))
    expected = ndimage.binary_erosion(mask[0] > 0.5, structure=k.astype(bool),
                                      border_value=1)  # kornia geodesic border
    np.testing.assert_array_equal(ours[0] > 0.5, expected)


def test_even_kernel_shapes(rng):
    """square(8) (the reference's best config) is even-sized; origin k//2."""
    mask = np.zeros((1, 16, 16), np.float32)
    mask[0, 8, 8] = 1.0
    out = np.asarray(Mo.dilation(mask, Mo.square(8)))
    ys, xs = np.nonzero(out[0])
    # dilation footprint with origin k//2: p spreads to [p-(k-1-origin), p+origin]
    assert ys.min() == 5 and ys.max() == 12 and xs.min() == 5 and xs.max() == 12
    assert out.sum() == 64


def test_erode_mask_with_disc_struct(rng):
    mask = rng.random((3, 24, 24)) > 0.4
    out = np.asarray(Mo.erode_mask_with_disc_struct(mask, radius=2))
    assert out.dtype == bool and out.shape == mask.shape
    assert out.sum() <= mask.sum()
