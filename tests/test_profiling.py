"""Profiling hooks: PhaseTimer accounting + the drivers' --profile scope."""

import json

import numpy as np

from samcarriestheburden_tpu.profiling import PhaseTimer


def test_phase_timer_accounting(tmp_path):
    t = PhaseTimer(sync=False)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        np.zeros(8)
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    t.dump(tmp_path / "phases.json")
    assert json.loads((tmp_path / "phases.json").read_text())["a"]["count"] == 2


def test_profiled_scope_writes_trace_and_phases(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from samcarriestheburden_tpu.cli.common import profiled

    out = tmp_path / "prof"
    with profiled(out) as timer:
        assert timer is not None
        with timer.phase("compute"):
            jnp.arange(4).sum().block_until_ready()
    phases = json.loads((out / "phases.json").read_text())
    assert phases["compute"]["count"] == 1
    # jax.profiler wrote a TensorBoard-loadable trace directory
    assert any(out.rglob("*.xplane.pb")) or any(out.rglob("*trace*"))


def test_profiled_off_is_noop():
    from samcarriestheburden_tpu.cli.common import profiled

    with profiled(None) as timer:
        assert timer is None
