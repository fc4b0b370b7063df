"""HPO driver for the three refinement studies (reference seg_processing/*.py).

python -m samcarriestheburden_tpu.cli.hpo --study sam_refine --model_id <id>
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description="Refinement HPO studies")
    p.add_argument("--study", required=True,
                   choices=["preprocess", "sam_refine", "rndwalk"])
    p.add_argument("--model_id", type=str, required=True,
                   help="registry id of the initial U-Net")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--n_trials", type=float, default=float("inf"),
                   help="inf = full grid for grid studies, 200 otherwise")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from samcarriestheburden_tpu.hpo import objectives

    builders = {
        "preprocess": objectives.build_preprocess_study,
        "sam_refine": objectives.build_sam_refine_study,
        "rndwalk": objectives.build_rndwalk_study,
    }
    objective, study = builders[args.study](args.model_id, args.data_root)
    catch = (ValueError,) if args.study == "rndwalk" else ()  # reference :62
    study.optimize(objective, n_trials=args.n_trials, catch=catch,
                   show_progress=True)
    print(study.best_params, study.best_value)

    out_dir = Path(args.out_dir or
                   f"seg_processing/hpo_results/{args.model_id}")
    names = {"preprocess": "hpo_seg_preprocess.json",
             "sam_refine": "grid_search_sam_refine.json",
             "rndwalk": "hpo_rnd_wlk_refine.json"}
    path = study.save(out_dir / names[args.study])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
