"""Mid-training checkpoint/resume via Orbax.

The reference never saves optimiser state — a crashed 350-epoch run restarts
from zero (SURVEY §5 'no mid-training resume').  Here the full TrainState
(params + AdamW moments + epoch) checkpoints atomically every N epochs and
training resumes exactly."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(directory, epoch: int, params, opt_state) -> Path:
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"epoch_{epoch:05d}"
    ckptr = _checkpointer()
    state = {"params": params,
             "opt_state": jax.tree.map(np.asarray, opt_state),
             "epoch": np.asarray(epoch)}
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory) -> Optional[Path]:
    directory = Path(directory)
    if not directory.exists():
        return None
    ckpts = sorted(directory.glob("epoch_*"))
    return ckpts[-1] if ckpts else None


def restore_train_state(path, params_like, opt_state_like):
    """Restore into the structure of (params_like, opt_state_like)."""
    ckptr = _checkpointer()
    target = {"params": params_like,
              "opt_state": opt_state_like,
              "epoch": np.asarray(0)}
    restored = ckptr.restore(Path(path).resolve(), target)
    return restored["params"], restored["opt_state"], int(restored["epoch"])
