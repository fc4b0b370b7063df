"""Hyper-parameter optimisation of the refinement knobs
(reference seg_processing/ — Optuna grid/TPE studies).  Self-contained
optuna-compatible study/sampler implementation; no external dependency."""
