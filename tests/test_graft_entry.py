"""Driver entry points: entry() must trace (abstract eval — no compile), and
dryrun_multichip must run a real sharded step on the virtual mesh."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__  # noqa: E402


def test_entry_traces():
    fn, args = __graft_entry__.entry()
    low_res, iou = jax.eval_shape(fn, *args)
    assert low_res.shape == (1, 1, 256, 256)
    assert iou.shape == (1, 1)


def test_dryrun_impl_inprocess():
    # the body itself, on the test session's virtual CPU mesh
    __graft_entry__._dryrun_multichip_impl(4)


def test_dryrun_multichip_subprocess_isolated(monkeypatch):
    """The public entry must succeed even from a process whose env points at
    an accelerator platform — the round-1 driver failure mode."""
    monkeypatch.setenv("JAX_PLATFORMS", "")      # as if unset / TPU-bound
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    __graft_entry__.dryrun_multichip(4)
