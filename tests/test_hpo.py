import numpy as np
import pytest

from samcarriestheburden_tpu.hpo.study import (
    GridSampler, Study, TPESampler, create_study)
from samcarriestheburden_tpu.ops.seg_preprocessing import (
    opening_with_connected_component)


def test_grid_sampler_exhausts_full_grid():
    space = {"a": [1, 2, 3], "b": ["x", "y"]}
    study = create_study("maximize", sampler=GridSampler(space))

    def objective(trial):
        a = trial.suggest_int("a", 1, 3)
        b = trial.suggest_categorical("b", ["x", "y"])
        return a + (1 if b == "y" else 0)

    study.optimize(objective, n_trials=float("inf"))
    assert len(study.trials) == 6
    seen = {(t.params["a"], t.params["b"]) for t in study.trials}
    assert len(seen) == 6
    assert study.best_params == {"a": 3, "b": "y"}
    assert study.best_value == 4


def test_tpe_sampler_finds_optimum():
    study = create_study("maximize", sampler=TPESampler(n_startup_trials=8), seed=1)

    def objective(trial):
        x = trial.suggest_float("x", -5, 5)
        return -(x - 2.0) ** 2

    study.optimize(objective, n_trials=60)
    assert abs(study.best_params["x"] - 2.0) < 1.0


def test_tpe_sampler_beats_random_on_reference_benchmarks():
    """Credibility check for the homebrew TPE-style sampler (VERDICT r3 #8):
    the defining published property of TPE (Bergstra et al. 2011, fig. 4-6;
    optuna's TPESampler docs) is that after the random-startup phase it
    converges measurably faster than pure random search at equal trial
    budget.  Verify that seeded, averaged over seeds, on three toy
    objectives of the kinds the reference studies use (continuous, 2-D
    Branin, mixed categorical+float) — plus the mechanism itself: post-
    startup samples concentrate in the good-quantile region."""
    import math

    from samcarriestheburden_tpu.hpo.study import RandomSampler

    def run(objective, sampler_fn, direction, seeds, n_trials):
        vals = []
        for s in seeds:
            st = create_study(direction, sampler=sampler_fn(), seed=s)
            st.optimize(objective, n_trials=n_trials)
            vals.append(st.best_value)
        return float(np.mean(vals))

    seeds = range(8)

    # 1) sharp 1-D quadratic: random rarely lands within the peak at 40
    # trials; TPE must (that's the concentration property)
    def quad(trial):
        x = trial.suggest_float("x", -10.0, 10.0)
        return -((x - 3.7) ** 2)

    tpe = run(quad, lambda: TPESampler(n_startup_trials=10), "maximize",
              seeds, 40)
    rnd = run(quad, RandomSampler, "maximize", seeds, 40)
    assert tpe > rnd, (tpe, rnd)
    assert tpe > -0.05, f"TPE mean best {tpe} not concentrated at optimum"

    # 2) Branin (classic continuous HPO benchmark, global min 0.3979)
    def branin(trial):
        x = trial.suggest_float("x", -5.0, 10.0)
        y = trial.suggest_float("y", 0.0, 15.0)
        return ((y - 5.1 / (4 * math.pi ** 2) * x ** 2
                 + 5 / math.pi * x - 6) ** 2
                + 10 * (1 - 1 / (8 * math.pi)) * math.cos(x) + 10)

    tpe_b = run(branin, lambda: TPESampler(n_startup_trials=10), "minimize",
                seeds, 60)
    rnd_b = run(branin, RandomSampler, "minimize", seeds, 60)
    assert tpe_b < rnd_b, (tpe_b, rnd_b)
    assert tpe_b < 1.5, f"TPE mean Branin best {tpe_b} too far from 0.398"

    # 3) mixed categorical + float (the shape of the reference's
    # preprocess study: method choice + radius): TPE must learn BOTH the
    # right category and the right region
    def mixed(trial):
        c = trial.suggest_categorical("c", ["disk", "square", "diamond"])
        x = trial.suggest_float("r", 0.0, 1.0)
        return ({"disk": 0.0, "square": -2.0, "diamond": -2.0}[c]
                - (x - 0.25) ** 2 * 8)

    tpe_m = run(mixed, lambda: TPESampler(n_startup_trials=10), "maximize",
                seeds, 50)
    rnd_m = run(mixed, RandomSampler, "maximize", seeds, 50)
    assert tpe_m > rnd_m, (tpe_m, rnd_m)

    # mechanism: post-startup draws concentrate near the good quantile —
    # the fraction within |x-3.7|<1 must far exceed the uniform rate (0.1)
    st = create_study("maximize", sampler=TPESampler(n_startup_trials=10),
                      seed=3)
    st.optimize(quad, n_trials=60)
    post = [t.params["x"] for t in st.trials[10:]]
    frac_near = np.mean([abs(x - 3.7) < 1.0 for x in post])
    assert frac_near > 0.4, f"only {frac_near:.0%} of post-startup samples " \
                            f"near the optimum (uniform would be ~10%)"


def test_catch_failed_trials():
    study = create_study("maximize")

    def objective(trial):
        v = trial.suggest_int("v", 0, 10)
        if trial.number % 2 == 0:
            raise ValueError("boom")
        return float(v)

    study.optimize(objective, n_trials=10, catch=ValueError)
    states = [t.state for t in study.trials]
    assert states.count("failed") == 5 and states.count("complete") == 5
    assert study.best_value is not None


def test_minimize_direction():
    study = create_study("minimize")

    def objective(trial):
        return float(trial.suggest_int("x", 0, 100))

    study.optimize(objective, n_trials=20)
    assert study.best_value == min(t.value for t in study.trials)


def test_study_persistence(tmp_path):
    study = create_study("maximize", study_name="s")
    study.set_user_attr("model_id", "abc")
    study.optimize(lambda t: float(t.suggest_int("x", 0, 5)), n_trials=4)
    path = study.save(tmp_path / "study.json")
    loaded = Study.load(path)
    assert loaded.study_name == "s"
    assert loaded.user_attrs["model_id"] == "abc"
    assert loaded.best_value == study.best_value
    assert len(loaded.trials) == 4


def test_opening_with_connected_component():
    prob = np.zeros((1, 40, 40), np.float32)
    prob[0, 5:20, 5:20] = 0.9
    prob[0, 30:32, 30:32] = 0.8  # tiny blob erased by opening
    out = np.asarray(opening_with_connected_component(prob, "disk", 2, 40, "largest"))
    assert out[0, 10, 10] > 0.5
    assert out[0, 30, 30] == 0.0
    # identity radius keeps everything
    out_id = np.asarray(opening_with_connected_component(prob, "square", 0, 40, None))
    np.testing.assert_allclose(out_id, prob, atol=1e-6)


def test_hpo_visualize(tmp_path):
    from samcarriestheburden_tpu.hpo.visualize import visualize_study

    study = create_study("maximize")
    study.optimize(lambda t: float(t.suggest_int("x", 0, 5))
                   + (0 if t.suggest_categorical("c", ["a", "b"]) == "a" else 1),
                   n_trials=6)
    path = study.save(tmp_path / "s.json")
    visualize_study(path, save_dir=tmp_path / "plots")
    assert (tmp_path / "plots" / "history.png").exists()
    assert (tmp_path / "plots" / "slice_x.png").exists()


def _register_tiny_unet(data_root):
    import jax

    from samcarriestheburden_tpu.config import UNetConfig
    from samcarriestheburden_tpu.models import unet
    from samcarriestheburden_tpu.models.modelio import ModelRegistry

    cfg = UNetConfig(n_channels=1, n_classes=17, base_channels=4, n_last_channel=4)
    params = unet.init(jax.random.PRNGKey(0), cfg)
    reg = ModelRegistry(data_root / "model_registry")
    return reg.register(cfg, params)


def test_preprocess_study_end_to_end(data_root):
    """Full objective over the synthetic data root with a registered U-Net."""
    from samcarriestheburden_tpu.hpo.objectives import build_preprocess_study

    mid = _register_tiny_unet(data_root)
    objective, study = build_preprocess_study(mid, data_root=str(data_root))
    study.optimize(objective, n_trials=2)
    assert len(study.trials) == 2
    assert all(t.state == "complete" for t in study.trials)
    assert np.isfinite(study.best_value)


def test_sam_refine_study_end_to_end(data_root):
    """The SAM prompt × morphology study (reference
    hpo_bce_unet_sam_postprocess.py:16-57) executes end-to-end: a registered
    tiny U-Net supplies val probabilities, the golden tiny-SAM decoder head
    refines them, and the grid sampler walks real grid points to finite
    Dice-difference scores."""
    from pathlib import Path

    from samcarriestheburden_tpu.data.h5io import EmbeddingWriter
    from samcarriestheburden_tpu.engine.decoder_head import SamMaskDecoderHead
    from samcarriestheburden_tpu.hpo.objectives import build_sam_refine_study
    from samcarriestheburden_tpu.models import convert
    from samcarriestheburden_tpu.config import sam_vit_t_config

    mid = _register_tiny_unet(data_root)

    # decoder head over a synthetic embedding for the ONE val-split image
    # (img003, 200x120 -> resize-longest-128 input frame 128x77)
    golden = np.load(Path(__file__).parent / "golden" / "sam_e2e.npz")
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("sd/")}
    cfg = sam_vit_t_config()
    params = {
        "prompt_encoder": convert.prompt_encoder_params_from_torch(sd),
        "mask_decoder": convert.mask_decoder_params_from_torch(sd, cfg.mask_decoder),
    }
    rng = np.random.default_rng(7)
    h5 = data_root / "emb.h5"
    with EmbeddingWriter(h5, checkpoint_name="tiny.npz",
                         img_encoder_img_size=128) as w:
        w.write("img003", rng.standard_normal((1, 16, 8, 8)).astype(np.float32),
                (200, 120), (128, 77))
    head = SamMaskDecoderHead(None, "vit_t", h5, params=params)

    objective, study = build_sam_refine_study(mid, data_root=str(data_root),
                                              decoder_head=head)
    study.optimize(objective, n_trials=2)
    assert len(study.trials) == 2
    assert all(t.state == "complete" for t in study.trials)
    assert np.isfinite(study.best_value)
    # the grid covers the reference search space
    assert {"prompts2use1st", "prompts2use2nd", "morph_op",
            "structuring_element", "radius"} <= set(study.trials[0].params)


def test_rndwalk_study_end_to_end(data_root):
    """The random-walk study (reference hpo_bce_unet_rndwalk_postprocess.py:
    15-49) executes end-to-end under its default TPE sampler: each trial
    erodes a background band, solves the walk on the real val image, and
    returns a finite Dice-difference score."""
    from samcarriestheburden_tpu.hpo.objectives import build_rndwalk_study

    mid = _register_tiny_unet(data_root)
    objective, study = build_rndwalk_study(mid, data_root=str(data_root))
    study.optimize(objective, n_trials=2)
    assert len(study.trials) == 2
    assert all(t.state == "complete" for t in study.trials)
    assert np.isfinite(study.best_value)
    assert {"background_erosion_radius", "laplace_sigma",
            "radius"} <= set(study.trials[0].params)
