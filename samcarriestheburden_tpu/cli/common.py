"""Shared CLI plumbing (reference unet_training/hyper_params.py:3-19)."""

from __future__ import annotations

import argparse
import contextlib

from samcarriestheburden_tpu.config import TrainConfig


def hp_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="training")
    # settings
    p.add_argument("--gpu_id", type=int, default=None,
                   help="accepted for reference-CLI parity; JAX manages devices")
    p.add_argument("--seed", type=int, default=42, help="seed for reproducibility")
    # hyperparameters
    p.add_argument("--lr", type=float, default=0.001, help="initial learning rate")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--infer_batch_size", type=int, default=16,
                   help="batch size during validation and testing")
    p.add_argument("--weight_decay", type=float, default=0,
                   help="weight decay used by optimizer")
    p.add_argument("--epochs", type=int, default=350,
                   help="number of epochs for training")
    p.add_argument("--data_aug", type=float, default=0.03,
                   help="strength of affine data augmentation.")
    p.add_argument("--lr_scheduler", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="whether to use learning rate scheduler")
    # architecture
    p.add_argument("--n_last_channel", type=int, default=64,
                   help="number of channels before the last convolution")
    # TPU-native additions
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel device count (default: all)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward pass (fp32 master params)")
    p.add_argument("--data_placement", choices=["replicated", "sharded"],
                   default="replicated",
                   help="dataset residency on the mesh: replicate (small "
                        "splits) or shard on the data axis (large datasets)")
    add_multihost_flags(p)
    return p


def add_multihost_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize before building the "
                        "mesh (auto-detects on TPU pods; pass --coordinator/"
                        "--num_processes/--process_id elsewhere)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (multi-host)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def train_config_from_args(args, **overrides) -> TrainConfig:
    kw = dict(seed=args.seed, lr=args.lr, batch_size=args.batch_size,
              infer_batch_size=args.infer_batch_size,
              weight_decay=args.weight_decay, epochs=args.epochs,
              data_aug=args.data_aug, lr_scheduler=args.lr_scheduler,
              n_last_channel=args.n_last_channel,
              compute_dtype="bfloat16" if getattr(args, "bf16", False) else "float32",
              data_placement=getattr(args, "data_placement", "replicated"))
    kw.update(overrides)
    return TrainConfig(**kw)


def add_profile_flag(p: argparse.ArgumentParser) -> None:
    p.add_argument("--profile", nargs="?", const="runs/profile", default=None,
                   metavar="DIR",
                   help="capture a jax.profiler device trace plus per-phase "
                        "wall-clock JSON into DIR (default runs/profile)")


@contextlib.contextmanager
def profiled(profile_dir):
    """Driver profiling scope: yields a PhaseTimer (or None when profiling is
    off); on exit writes ``<dir>/phases.json`` and the TensorBoard-loadable
    device trace captured by jax.profiler."""
    if not profile_dir:
        yield None
        return
    from pathlib import Path

    from samcarriestheburden_tpu.profiling import PhaseTimer, trace

    timer = PhaseTimer()
    try:
        with trace(profile_dir):
            yield timer
    finally:
        timer.dump(Path(profile_dir) / "phases.json")
        print(f"profile: phase timings -> {profile_dir}/phases.json; "
              f"device trace -> {profile_dir}")


def setup_backend(args) -> None:
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "multihost", False):
        from samcarriestheburden_tpu.parallel.distributed import initialize

        initialize(getattr(args, "coordinator", None),
                   getattr(args, "num_processes", None),
                   getattr(args, "process_id", None))


def maybe_mesh(args):
    """Data mesh over the largest device count that divides the batch size
    (padding-free sharding); None on a single device."""
    import math

    import jax

    n = args.num_devices or len(jax.devices())
    batch = getattr(args, "batch_size", None)
    if batch is not None:
        n = math.gcd(n, batch)
    if n <= 1:
        return None
    from samcarriestheburden_tpu.parallel.mesh import make_mesh

    return make_mesh(n)
