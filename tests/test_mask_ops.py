import numpy as np

from samcarriestheburden_tpu.ops import mask_ops as M


def test_stability_score(rng):
    logits = rng.standard_normal((4, 16, 16)).astype(np.float32) * 3
    out = np.asarray(M.calculate_stability_score(logits, 0.0, 1.0))
    inter = (logits > 1.0).sum((-1, -2))
    union = (logits > -1.0).sum((-1, -2))
    np.testing.assert_allclose(out, inter / union, rtol=1e-6)


def test_batched_mask_to_box(rng):
    masks = rng.random((5, 12, 18)) > 0.7
    masks[2] = False  # empty mask -> [0,0,0,0]
    out = np.asarray(M.batched_mask_to_box(masks))
    for i, m in enumerate(masks):
        if not m.any():
            np.testing.assert_array_equal(out[i], [0, 0, 0, 0])
        else:
            ys, xs = np.nonzero(m)
            np.testing.assert_array_equal(out[i], [xs.min(), ys.min(), xs.max(), ys.max()])


def test_batched_mask_to_box_nd(rng):
    masks = rng.random((2, 3, 8, 8)) > 0.5
    out = np.asarray(M.batched_mask_to_box(masks))
    assert out.shape == (2, 3, 4)


def test_point_grid():
    grid = M.build_point_grid(4)
    assert grid.shape == (16, 2)
    assert np.isclose(grid[0, 0], 1 / 8) and np.isclose(grid[-1, 1], 7 / 8)
    layers = M.build_all_layer_point_grids(32, 2, 2)
    assert [len(g) for g in layers] == [32 ** 2, 16 ** 2, 8 ** 2]


def test_generate_crop_boxes():
    boxes, layers = M.generate_crop_boxes((600, 800), n_layers=1, overlap_ratio=0.25)
    assert boxes[0] == [0, 0, 800, 600] and layers[0] == 0
    assert len(boxes) == 1 + 4 and layers[1:] == [1] * 4
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 < x1 <= 800 and 0 <= y0 < y1 <= 600


def test_uncrop_roundtrip(rng):
    crop_box = [10, 20, 30, 50]
    boxes = rng.integers(0, 20, (3, 4))
    np.testing.assert_array_equal(
        np.asarray(M.uncrop_boxes_xyxy(boxes, crop_box)), boxes + np.array([10, 20, 10, 20]))
    pts = rng.integers(0, 20, (3, 2))
    np.testing.assert_array_equal(np.asarray(M.uncrop_points(pts, crop_box)),
                                  pts + np.array([10, 20]))
    masks = rng.random((2, 30, 20)) > 0.5  # crop is (H=30, W=20)
    out = np.asarray(M.uncrop_masks(masks, crop_box, 100, 80))
    assert out.shape == (2, 100, 80)
    np.testing.assert_array_equal(out[:, 20:50, 10:30], masks)
    assert out.sum() == masks.sum()


def test_is_box_near_crop_edge():
    crop_box = [0, 0, 100, 100]
    orig_box = [0, 0, 200, 200]
    boxes = np.array([[5.0, 50, 60, 60],     # near left crop edge (and not image edge... x0=5 near 0 which IS image edge)
                      [50.0, 50, 99, 60],    # near right crop edge (x1=99 ~ 100, image edge 200 far)
                      [40.0, 40, 60, 60]])   # interior
    out = np.asarray(M.is_box_near_crop_edge(boxes, crop_box, orig_box))
    assert out[1] and not out[2]
    assert not out[0]  # x0 near 0 == also image edge -> excluded


def test_box_xyxy_to_xywh():
    out = np.asarray(M.box_xyxy_to_xywh(np.array([1, 2, 5, 9])))
    np.testing.assert_array_equal(out, [1, 2, 4, 7])


def test_batch_iterator():
    batches = list(M.batch_iterator(3, list(range(7)), list("abcdefg")))
    assert len(batches) == 3
    assert batches[0][0] == [0, 1, 2] and batches[-1][0] == [6]
