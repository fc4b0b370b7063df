"""Automatic mask generation (reference segment_anything/automatic_mask_generator.py).

TPU-native layout of the same algorithm:

* the point grid is processed in fixed-size batches through one jitted
  decode+postprocess+score program — predicted IoU, stability score,
  thresholded masks and boxes all come back from a single device dispatch;
* data-dependent *filtering* (IoU/stability/edge gates, NMS, RLE) happens
  host-side on numpy, exactly mirroring the reference's MaskData flow, since
  survivors are variable-length by nature;
* NMS itself runs as the jittable keep-mask kernel from ops/nms.py.
"""

from __future__ import annotations

from typing import Any, Dict, ItemsView, List, Optional

import jax.numpy as jnp
import numpy as np

from samcarriestheburden_tpu.engine.predictor import SamPredictor
from samcarriestheburden_tpu.models.sam import SamModel
from samcarriestheburden_tpu.ops.mask_ops import (
    batch_iterator, batched_mask_to_box, box_xyxy_to_xywh,
    build_all_layer_point_grids, calculate_stability_score, generate_crop_boxes,
    is_box_near_crop_edge, uncrop_boxes_xyxy, uncrop_masks, uncrop_points)
from samcarriestheburden_tpu.ops.nms import batched_nms_mask
from samcarriestheburden_tpu.ops.rle import (
    area_from_rle, coco_encode_rle, mask_to_rle, rle_to_mask)


class MaskData:
    """Batched mask-record container with filter/cat (reference amg.py:16-75),
    numpy-backed."""

    def __init__(self, **kwargs) -> None:
        for v in kwargs.values():
            assert isinstance(v, (list, np.ndarray)), \
                "MaskData values must be lists or numpy arrays"
        self._stats: Dict[str, Any] = dict(**kwargs)

    def __setitem__(self, key, item):
        assert isinstance(item, (list, np.ndarray)), \
            "MaskData values must be lists or numpy arrays"
        self._stats[key] = item

    def __delitem__(self, key):
        del self._stats[key]

    def __getitem__(self, key):
        return self._stats[key]

    def items(self) -> ItemsView[str, Any]:
        return self._stats.items()

    def filter(self, keep: np.ndarray) -> None:
        for k, v in self._stats.items():
            if v is None:
                continue
            elif isinstance(v, np.ndarray):
                self._stats[k] = v[keep]
            elif isinstance(v, list) and keep.dtype == bool:
                self._stats[k] = [a for i, a in enumerate(v) if keep[i]]
            elif isinstance(v, list):
                self._stats[k] = [v[i] for i in keep]
            else:
                raise TypeError(
                    f"cannot filter MaskData[{k!r}]: type {type(v)}")

    def cat(self, new_stats: "MaskData") -> None:
        for k, v in new_stats.items():
            if k not in self._stats or self._stats[k] is None:
                self._stats[k] = v.copy() if isinstance(v, np.ndarray) else list(v)
            elif isinstance(v, np.ndarray):
                self._stats[k] = np.concatenate([self._stats[k], v], axis=0)
            elif isinstance(v, list):
                self._stats[k] = self._stats[k] + list(v)
            else:
                raise TypeError(
                    f"cannot concatenate MaskData[{k!r}]: type {type(v)}")

    def to_numpy(self) -> None:
        pass  # already numpy

    def __len__(self):
        for v in self._stats.values():
            return len(v)
        return 0


class SamAutomaticMaskGenerator:
    def __init__(self, model: SamModel, points_per_side: Optional[int] = 32,
                 points_per_batch: int = 64, pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7, crop_n_layers: int = 0,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1,
                 point_grids: Optional[List[np.ndarray]] = None,
                 min_mask_region_area: int = 0,
                 output_mode: str = "binary_mask") -> None:
        """Same knobs and defaults as the reference (:36-134)."""
        assert (points_per_side is None) != (point_grids is None), \
            "Exactly one of points_per_side or point_grid must be provided."
        if points_per_side is not None:
            self.point_grids = build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        else:
            self.point_grids = point_grids

        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle"), \
            f"Unknown output_mode {output_mode}."
        if min_mask_region_area > 0:
            # fail early (like the reference's eager cv2 import,
            # automatic_mask_generator.py) if NO small-region backend exists;
            # the preferred backend is the native union-find CCL, cv2 is the
            # fallback — see ops/regions._label_with_areas
            from samcarriestheburden_tpu import native
            if native.load() is None:
                import cv2  # noqa: F401  (host-side small-region postprocess)

        self.predictor = SamPredictor(model)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.crop_n_points_downscale_factor = crop_n_points_downscale_factor
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode

    # ------------------------------------------------------------------

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: HWC uint8.  Returns reference-format mask records (:137-195)."""
        mask_data = self._generate_masks(image)

        if self.min_mask_region_area > 0:
            mask_data = self.postprocess_small_regions(
                mask_data, self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh))

        if self.output_mode == "coco_rle":
            mask_data["segmentations"] = [coco_encode_rle(r) for r in mask_data["rles"]]
        elif self.output_mode == "binary_mask":
            mask_data["segmentations"] = [rle_to_mask(r) for r in mask_data["rles"]]
        else:
            mask_data["segmentations"] = mask_data["rles"]

        # xyxy -> xywh converted for ALL records in one host numpy op — a
        # per-record jnp call would be one device round-trip per mask
        # (hundreds of RTTs on a remote chip)
        def xywh_np(a):
            a = np.asarray(a, np.float32).reshape(-1, 4).copy()
            a[:, 2] -= a[:, 0]
            a[:, 3] -= a[:, 1]
            return a

        bboxes = xywh_np(mask_data["boxes"]) if len(mask_data["rles"]) else []
        crop_xywh = xywh_np(np.asarray(mask_data["crop_boxes"])) \
            if len(mask_data["rles"]) else []
        curr_anns = []
        for idx in range(len(mask_data["segmentations"])):
            curr_anns.append({
                "segmentation": mask_data["segmentations"][idx],
                "area": area_from_rle(mask_data["rles"][idx]),
                "bbox": bboxes[idx].tolist(),
                "predicted_iou": float(mask_data["iou_preds"][idx]),
                "point_coords": [mask_data["points"][idx].tolist()],
                "stability_score": float(mask_data["stability_score"][idx]),
                "crop_box": crop_xywh[idx].tolist(),
            })
        return curr_anns

    def _generate_masks(self, image: np.ndarray) -> MaskData:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)

        data = MaskData()
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            data.cat(self._process_crop(image, crop_box, layer_idx, orig_size))

        if len(crop_boxes) > 1 and len(data) > 0:
            # Prefer masks from smaller crops (:210-220)
            boxes = np.asarray(data["crop_boxes"], np.float32)
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            keep = np.asarray(batched_nms_mask(
                np.asarray(data["boxes"], np.float32), 1.0 / areas,
                np.zeros(len(data), np.int32), self.crop_nms_thresh))
            data.filter(keep)
        return data

    def _process_crop(self, image, crop_box, crop_layer_idx, orig_size) -> MaskData:
        x0, y0, x1, y1 = crop_box
        cropped_im = image[y0:y1, x0:x1, :]
        cropped_im_size = cropped_im.shape[:2]
        self.predictor.set_image(cropped_im)

        points_scale = np.array(cropped_im_size)[None, ::-1]
        points_for_image = self.point_grids[crop_layer_idx] * points_scale

        data = MaskData()
        for (points,) in batch_iterator(self.points_per_batch, points_for_image):
            data.cat(self._process_batch(points, cropped_im_size, crop_box, orig_size))
        self.predictor.reset_image()

        if len(data) > 0:
            keep = np.asarray(batched_nms_mask(
                np.asarray(data["boxes"], np.float32),
                np.asarray(data["iou_preds"], np.float32),
                np.zeros(len(data), np.int32), self.box_nms_thresh))
            data.filter(keep)

        data["boxes"] = np.asarray(uncrop_boxes_xyxy(data["boxes"], crop_box))
        data["points"] = np.asarray(uncrop_points(data["points"], crop_box))
        data["crop_boxes"] = [crop_box for _ in range(len(data["rles"]))]
        return data

    def _process_batch(self, points, im_size, crop_box, orig_size) -> MaskData:
        orig_h, orig_w = orig_size
        # pad the final short batch so the jitted program has one shape
        n = len(points)
        pad = self.points_per_batch - n
        if pad > 0:
            points = np.concatenate([points, np.zeros((pad, 2))], axis=0)

        transformed = self.predictor.transform.apply_coords(points, im_size)
        masks, iou_preds, _ = self.predictor.predict_batched(
            transformed[:, None, :].astype(np.float32),
            np.ones((len(points), 1), np.int32),
            multimask_output=True, return_logits=True)

        thr = self.predictor.model.mask_threshold
        stability = calculate_stability_score(masks, thr, self.stability_score_offset)
        bin_masks = masks > thr
        boxes = batched_mask_to_box(bin_masks)

        # flatten (B, 3, H, W) -> (B·3, ...) and drop padding, then host
        # filters.  Masks cross the host link bit-packed (8x smaller — the
        # raw bool batch is ~200 MB at 1024² with 64 points x 3 masks).
        from samcarriestheburden_tpu.ops.mask_ops import (packbits_device,
                                                          unpackbits_host)

        h_m, w_m = bin_masks.shape[-2:]
        wpad = (-w_m) % 8
        packed = packbits_device(jnp.pad(
            bin_masks, [(0, 0)] * (bin_masks.ndim - 1) + [(0, wpad)]))
        host_masks = unpackbits_host(np.asarray(packed), w_m)
        flat = slice(0, n * bin_masks.shape[1])
        data = MaskData(
            masks=host_masks.reshape(-1, h_m, w_m)[flat],
            iou_preds=np.asarray(iou_preds).reshape(-1)[flat],
            stability_score=np.asarray(stability).reshape(-1)[flat],
            boxes=np.asarray(boxes).reshape(-1, 4)[flat],
            points=points[:n].repeat(bin_masks.shape[1], axis=0),
        )

        if self.pred_iou_thresh > 0.0:
            data.filter(data["iou_preds"] > self.pred_iou_thresh)
        if self.stability_score_thresh > 0.0:
            data.filter(data["stability_score"] >= self.stability_score_thresh)

        keep = ~np.asarray(is_box_near_crop_edge(
            data["boxes"], crop_box, [0, 0, orig_w, orig_h]))
        if not keep.all():
            data.filter(keep)

        # uncrop = place the crop into the full frame: pure zero-padding, done
        # host-side (np.pad) — routing it through uncrop_masks' device op
        # round-trips the raw mask batch over the host link twice
        x0, y0, x1, y1 = crop_box
        if (x0, y0, x1, y1) != (0, 0, orig_w, orig_h):
            data["masks"] = np.pad(
                data["masks"],
                ((0, 0), (y0, orig_h - y1), (x0, orig_w - x1)))
        data["rles"] = mask_to_rle(data["masks"])
        del data["masks"]
        return data

    # ------------------------------------------------------------------

    @staticmethod
    def postprocess_small_regions(mask_data: MaskData, min_area: int,
                                  nms_thresh: float) -> MaskData:
        """Hole/island removal + re-NMS (reference :323-372); host-side via
        ops.regions.remove_small_regions (own union-find CCL, no cv2)."""
        from samcarriestheburden_tpu.ops.regions import remove_small_regions

        if len(mask_data["rles"]) == 0:
            return mask_data

        new_masks, scores = [], []
        for rle in mask_data["rles"]:
            mask = rle_to_mask(rle)
            mask, changed = remove_small_regions(mask, min_area, mode="holes")
            unchanged = not changed
            mask, changed = remove_small_regions(mask, min_area, mode="islands")
            unchanged = unchanged and not changed
            new_masks.append(mask[None])
            scores.append(float(unchanged))

        masks = np.concatenate(new_masks, axis=0)
        boxes = np.asarray(batched_mask_to_box(masks))
        keep = np.asarray(batched_nms_mask(boxes.astype(np.float32),
                                           np.asarray(scores, np.float32),
                                           np.zeros(len(masks), np.int32), nms_thresh))
        for i_mask in np.flatnonzero(keep):
            if scores[i_mask] == 0.0:  # recompute only changed masks
                mask_data["rles"][i_mask] = mask_to_rle(masks[i_mask][None])[0]
                mask_data["boxes"][i_mask] = boxes[i_mask]
        mask_data.filter(keep)
        return mask_data
