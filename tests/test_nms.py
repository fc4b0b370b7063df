import numpy as np

from samcarriestheburden_tpu.ops.nms import batched_nms_mask, box_iou, nms_mask


def _greedy_nms_ref(boxes, scores, thr):
    """Brute-force torchvision-semantics NMS for the oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xa0, ya0, xa1, ya1 = boxes[i]
            xb0, yb0, xb1, yb1 = boxes[j]
            iw = max(0.0, min(xa1, xb1) - max(xa0, xb0))
            ih = max(0.0, min(ya1, yb1) - max(ya0, yb0))
            inter = iw * ih
            union = ((xa1 - xa0) * (ya1 - ya0) + (xb1 - xb0) * (yb1 - yb0) - inter)
            if union > 0 and inter / union > thr:
                suppressed[j] = True
    return sorted(keep)


def _random_boxes(rng, n):
    xy = rng.random((n, 2)) * 80
    wh = rng.random((n, 2)) * 40 + 1
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_box_iou_identity(rng):
    boxes = _random_boxes(rng, 6)
    iou = np.asarray(box_iou(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)


def test_nms_matches_bruteforce(rng):
    for trial in range(5):
        boxes = _random_boxes(rng, 40)
        scores = rng.random(40).astype(np.float32)
        keep = np.asarray(nms_mask(boxes, scores, 0.5))
        expected = _greedy_nms_ref(boxes, scores, 0.5)
        assert sorted(np.flatnonzero(keep).tolist()) == expected


def test_nms_valid_mask(rng):
    boxes = _random_boxes(rng, 10)
    scores = rng.random(10).astype(np.float32)
    valid = np.arange(10) < 5
    keep = np.asarray(nms_mask(boxes, scores, 0.5, valid=valid))
    assert not keep[5:].any()
    expected = _greedy_nms_ref(boxes[:5], scores[:5], 0.5)
    assert sorted(np.flatnonzero(keep[:5]).tolist()) == expected


def test_batched_nms_categories(rng):
    # identical boxes in different categories must not suppress each other
    boxes = np.tile(np.array([[0.0, 0, 10, 10]]), (2, 1)).astype(np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    cats = np.array([0, 1])
    keep = np.asarray(batched_nms_mask(boxes, scores, cats, 0.5))
    assert keep.all()
    keep_same = np.asarray(batched_nms_mask(boxes, scores, np.array([0, 0]), 0.5))
    assert keep_same.tolist() == [True, False]
