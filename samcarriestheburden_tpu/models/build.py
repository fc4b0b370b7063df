"""SAM model registry (reference segment_anything/build_sam.py).

``sam_model_registry['vit_h'](checkpoint=...)`` returns a :class:`SamModel`.
Checkpoints may be:

* a torch ``.pth`` state dict (the published SAM weights) — converted on load;
* a native ``.npz`` pytree written by :mod:`samcarriestheburden_tpu.models.modelio`.
"""

from __future__ import annotations

from pathlib import Path
import jax

from samcarriestheburden_tpu.config import (
    SamConfig, sam_vit_b_config, sam_vit_h_config, sam_vit_l_config,
    sam_vit_t_config)
from samcarriestheburden_tpu.models import convert
from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init


def _build(cfg: SamConfig, checkpoint=None, seed: int = 0) -> SamModel:
    if checkpoint is None:
        params = sam_init(jax.random.PRNGKey(seed), cfg)
    else:
        checkpoint = Path(checkpoint)
        if checkpoint.suffix == ".npz":
            from samcarriestheburden_tpu.models import modelio
            params = modelio.load_params(checkpoint)
        else:
            sd = convert.load_torch_state_dict(checkpoint)
            params = convert.sam_params_from_torch(sd, cfg)
        params = jax.tree.map(jax.numpy.asarray, params)
    return SamModel(cfg=cfg, params=params)


def build_sam_vit_h(checkpoint=None) -> SamModel:
    return _build(sam_vit_h_config(), checkpoint)


def build_sam_vit_l(checkpoint=None) -> SamModel:
    return _build(sam_vit_l_config(), checkpoint)


def build_sam_vit_b(checkpoint=None) -> SamModel:
    return _build(sam_vit_b_config(), checkpoint)


def build_sam_vit_t(checkpoint=None) -> SamModel:
    """Tiny test-scale config (no reference analogue; not a released model)."""
    return _build(sam_vit_t_config(), checkpoint)


build_sam = build_sam_vit_h

sam_model_registry = {
    "default": build_sam_vit_h,
    "vit_h": build_sam_vit_h,
    "vit_l": build_sam_vit_l,
    "vit_b": build_sam_vit_b,
    "vit_t": build_sam_vit_t,
}
