"""Tracing / profiling hooks (SURVEY §5: absent in the reference — tqdm only).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace.
* :class:`PhaseTimer` — lightweight wall-clock accounting per pipeline phase
  (encode / prompt-extract / decode / postprocess / io), used by the drivers
  under ``--profile``.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict


@contextlib.contextmanager
def trace(log_dir="runs/profile"):
    """Capture a device trace: ``with trace('dir'): ...`` then load the dir in
    TensorBoard or xprof."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


_SYNC_FN = None


def _sync_op():
    """A trivial jitted computation whose fetched result bounds all previously
    enqueued device work (single-stream execution order).  The jitted fn is
    built once and cached at module level: a fresh ``jax.jit(lambda: ...)``
    per call would miss jit's dispatch cache every time and add trace
    overhead inside the very window PhaseTimer measures."""
    global _SYNC_FN
    if _SYNC_FN is None:
        import jax
        import jax.numpy as jnp

        _SYNC_FN = jax.jit(lambda: jnp.zeros((), jnp.float32) + 1)
    return _SYNC_FN()


class PhaseTimer:
    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                import jax

                try:
                    jax.effects_barrier()
                    # drain pending pure computation: run a tiny jitted op on
                    # the device and fetch it — compute dispatch is ordered,
                    # so its completion bounds everything enqueued before it.
                    # (A bare device_put is NOT ordered against the compute
                    # stream — round-2 ADVICE — and over the axon tunnel
                    # block_until_ready on transfers returns early.)
                    float(_sync_op())
                except Exception:
                    pass
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, dict]:
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * self.totals[name]
                                        / max(self.counts[name], 1), 3)}
                for name in sorted(self.totals)}

    def dump(self, path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.report(), indent=2))
