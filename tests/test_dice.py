import numpy as np

from samcarriestheburden_tpu.ops.dice import jaccard_to_dice, multiclass_dice, multilabel_dice


def test_multilabel_dice_basic(rng):
    y_hat = rng.random((2, 3, 8, 8)) > 0.5
    y = rng.random((2, 3, 8, 8)) > 0.5
    out = np.asarray(multilabel_dice(y_hat, y))
    inter = (y_hat & y).reshape(2, 3, -1).sum(-1)
    card = y_hat.reshape(2, 3, -1).sum(-1) + y.reshape(2, 3, -1).sum(-1)
    expected = 2 * inter / (card + 1e-8)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_multilabel_dice_nan_for_empty_gt():
    y_hat = np.ones((1, 2, 4, 4), bool)
    y = np.zeros((1, 2, 4, 4), bool)
    y[0, 0, 0, 0] = True
    out = np.asarray(multilabel_dice(y_hat, y))
    assert not np.isnan(out[0, 0])
    assert np.isnan(out[0, 1])  # empty GT class -> NaN (reference :51)


def test_multilabel_dice_perfect():
    y = np.zeros((1, 1, 4, 4), bool)
    y[0, 0, 1:3, 1:3] = True
    out = np.asarray(multilabel_dice(y, y))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_multiclass_dice(rng):
    y = rng.integers(0, 4, (2, 16, 16))
    y_hat = rng.integers(0, 4, (2, 16, 16))
    out = np.asarray(multiclass_dice(y_hat, y, max_label=3))
    assert out.shape == (2, 3)
    # spot-check class 1 of batch 0
    a, b = y_hat[0] == 1, y[0] == 1
    expected = 2 * (a & b).sum() / (a.sum() + b.sum() + 1e-8)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_jaccard_to_dice():
    np.testing.assert_allclose(np.asarray(jaccard_to_dice(np.array(0.5))), 2 / 3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jaccard_to_dice(np.array(1.0))), 1.0, rtol=1e-6)
