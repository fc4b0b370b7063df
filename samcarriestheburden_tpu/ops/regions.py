"""Host-side small-region removal (reference segment_anything/utils/amg.py:267-291).

Uses OpenCV's connectedComponentsWithStats like the reference; this runs in
the AMG finalisation stage on already-host-resident masks, so a device version
would only add transfers."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _label_with_areas(working_mask: np.ndarray):
    """(labels, n_labels, per-label areas) via the native union-find CCL,
    falling back to cv2.connectedComponentsWithStats."""
    from samcarriestheburden_tpu import native

    res = native.connected_components_with_areas(working_mask > 0)
    if res is not None:
        labels, areas = res
        return labels, len(areas), areas[1:]
    import cv2

    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(
        working_mask.astype(np.uint8), 8)
    return regions, n_labels, stats[:, -1][1:]


def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """Remove small disconnected regions ('islands') or holes ('holes').
    Returns (mask, changed)."""
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working_mask = (correct_holes ^ mask).astype(np.uint8)
    regions, n_labels, sizes = _label_with_areas(working_mask)
    small_regions = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small_regions:
        return mask, False
    fill_labels = [0] + small_regions
    if not correct_holes:
        fill_labels = [i for i in range(n_labels) if i not in fill_labels]
        if not fill_labels:  # keep the largest if everything is below threshold
            fill_labels = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill_labels), True
