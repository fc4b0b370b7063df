"""The three reference HPO studies (seg_processing/hpo_*.py), built on the
package's refinement engine and optuna-compatible study core.

Each builder returns (objective, study); the CLI in cli/hpo.py runs them.
All objectives share the reference's score: mean over the validation split of
(Dice_refined − Dice_baseline), NaN-aware (hpo_bce_unet_sam_postprocess.py:51-57).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from samcarriestheburden_tpu.hpo.study import GridSampler, create_study


def _predict_probs_fn(unet_cfg, params):
    import jax

    from samcarriestheburden_tpu.config import GRAZ_IMG_MEAN, GRAZ_IMG_STD
    from samcarriestheburden_tpu.models import unet

    @jax.jit
    def predict(x):
        x = (x - GRAZ_IMG_MEAN) / GRAZ_IMG_STD
        return jax.nn.sigmoid(unet.apply(params, unet_cfg, x))

    return predict


def _val_predictions(model_id: str, data_root: str):
    """Shared setup: U-Net probabilities + GT over the validation split."""
    from samcarriestheburden_tpu.data.datasets import LightSegGrazPedWriDataset
    from samcarriestheburden_tpu.models.modelio import ModelRegistry

    registry = ModelRegistry(Path(data_root) / "model_registry")
    unet_cfg, params = registry.load(model_id)
    predict = _predict_probs_fn(unet_cfg, params)
    ds = LightSegGrazPedWriDataset("val", data_root=data_root)
    xs, ys, names = ds.as_arrays()
    probs = np.asarray(predict(xs))
    return probs, ys.astype(bool), names


def _dice_diff_score(refined_list, baseline_list, gt) -> float:
    from samcarriestheburden_tpu.ops.dice import multilabel_dice

    refined = np.stack(refined_list)
    baseline = np.stack(baseline_list)
    d_ref = np.asarray(multilabel_dice(refined, gt))
    d_base = np.asarray(multilabel_dice(baseline, gt))
    return float(np.nanmean(d_ref - d_base))


# ---------------------------------------------------------------------------
# Study 1: preprocessing opening (reference hpo_seg_preprocess.py)
# ---------------------------------------------------------------------------


def build_preprocess_study(model_id: str, data_root: str = "data",
                           seed: int = 0) -> Tuple:
    from samcarriestheburden_tpu.ops.seg_preprocessing import (
        opening_with_connected_component)

    probs, gt, _ = _val_predictions(model_id, data_root)

    def objective(trial):
        struct = trial.suggest_categorical(
            "structuring_element", ["square", "disk", "diamond", "star"])
        radius = trial.suggest_int("radius", 0, 8)
        selection = trial.suggest_categorical(
            "selection", ["largest", "highest_probability", None])
        trial.set_user_attr("num_iter", 250)

        refined, baseline = [], []
        for y_hat in probs:
            y_ref = np.asarray(opening_with_connected_component(
                y_hat, struct, radius, trial.user_attrs["num_iter"], selection))
            baseline.append(y_hat > 0.5)
            refined.append(y_ref > 0.5)
        return _dice_diff_score(refined, baseline, gt)

    space = {"structuring_element": ["square", "disk", "diamond", "star"],
             "radius": list(range(9)),
             "selection": ["largest", "highest_probability", None]}
    study = create_study("maximize", "HPO segmentation preprocessing",
                         GridSampler(space), seed)
    study.set_user_attr("model_id", model_id)
    return objective, study


# ---------------------------------------------------------------------------
# Study 2: SAM prompt × morphology grid (reference hpo_bce_unet_sam_postprocess.py)
# ---------------------------------------------------------------------------


def build_sam_refine_study(model_id: str, data_root: str = "data",
                           sam_type: str = "SAM", seed: int = 0,
                           decoder_head=None) -> Tuple:
    from samcarriestheburden_tpu.engine.refinement import SamSegRefiner, SegEnhance

    probs, gt, names = _val_predictions(model_id, data_root)
    prompt_choices = ["box", "pos_points neg_points", "pos_points"]

    def objective(trial):
        p1 = trial.suggest_categorical("prompts2use1st", prompt_choices).split()
        p2 = trial.suggest_categorical("prompts2use2nd", prompt_choices + [None])
        prompts2use = p1 if p2 is None else [p1, p2.split()]

        refiner = SamSegRefiner(decoder_head if decoder_head is not None else sam_type,
                                None, prompts2use, data_root=data_root)
        seg_processor = SegEnhance(
            refiner, "highest_probability",
            trial.suggest_categorical("morph_op", ["erosion", "dilation"]),
            trial.suggest_categorical("structuring_element",
                                      ["square", "disk", "diamond", "star"]),
            trial.suggest_int("radius", 0, 8), None)

        # whole validation set in one image-batched dispatch (SegEnhance
        # .enhance_batch) — the reference loops images per trial
        masks, _ = seg_processor.enhance_batch(np.stack(probs), list(names))
        refined = [np.asarray(m).astype(bool) for m in np.asarray(masks)]
        baseline = [y_hat > 0.5 for y_hat in probs]
        return _dice_diff_score(refined, baseline, gt)

    space = {"prompts2use1st": prompt_choices,
             "prompts2use2nd": prompt_choices + [None],
             "structuring_element": ["square", "disk", "diamond", "star"],
             "radius": list(range(9)),
             "morph_op": ["erosion", "dilation"]}
    study = create_study("maximize", f"SAM refinement study for {model_id}",
                         GridSampler(space), seed)
    study.set_user_attr("model_id", model_id)
    return objective, study


# ---------------------------------------------------------------------------
# Study 3: random walk (reference hpo_bce_unet_rndwalk_postprocess.py)
# ---------------------------------------------------------------------------


def build_rndwalk_study(model_id: str, data_root: str = "data",
                        seed: int = 0) -> Tuple:
    from samcarriestheburden_tpu.engine.refinement import (
        RndWalkSegRefiner, SegEnhance)

    probs, gt, names = _val_predictions(model_id, data_root)
    img_dir = Path(data_root) / "img_only_front_all_left"

    def objective(trial):
        refiner = RndWalkSegRefiner(
            trial.suggest_int("background_erosion_radius", 1, 16),
            trial.suggest_float("laplace_sigma", 1, 20),
            img_path=img_dir)
        seg_processor = SegEnhance(refiner, "highest_probability", "erosion",
                                   "disk", trial.suggest_int("radius", 0, 16),
                                   None)
        refined, baseline = [], []
        for y_hat, name in zip(probs, names):
            masks, _ = seg_processor.enhance(y_hat, name)
            refined.append(np.asarray(masks).astype(bool))
            baseline.append(y_hat > 0.5)
        return _dice_diff_score(refined, baseline, gt)

    study = create_study("maximize", f"RndWalk refinement study for {model_id}",
                         seed=seed)  # TPE sampler, like the reference default
    study.set_user_attr("model_id", model_id)
    return objective, study
