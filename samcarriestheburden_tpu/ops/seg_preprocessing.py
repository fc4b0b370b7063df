"""Mask pre/post-processing combinations
(reference utils/segmentation_preprocessing.py:74-119).

Composes the device-side morphology and connected-component ops; everything
stays jittable for fixed knob values."""

from __future__ import annotations

import jax.numpy as jnp

from samcarriestheburden_tpu.ops.ccl import (  # noqa: F401 (re-export, reference import surface)
    connected_components, remove_all_but_one_connected_component)
from samcarriestheburden_tpu.ops.morphology import (  # noqa: F401
    dilation, erode_mask_with_disc_struct, erosion, get_struct_element)


def opening_with_connected_component(prob_mask: jnp.ndarray,
                                     structuring_element: str, radius: int,
                                     num_iter: int, selection):
    """Morphological opening with optional single-component selection between
    erosion and dilation (reference segmentation_preprocessing.py:74-119).

    prob_mask: (C, H, W) probabilities.  Returns processed probabilities.
    """
    assert prob_mask.ndim == 3, "prob_mask should be 3D tensor of shape (C, H, W)"
    prob_mask = jnp.asarray(prob_mask, jnp.float32)
    kernel = jnp.asarray(get_struct_element(structuring_element, radius))

    binary = (prob_mask > 0.5).astype(jnp.float32)
    eroded = erosion(binary, kernel)
    if selection is not None:
        masked_prob = prob_mask * eroded
        eroded = remove_all_but_one_connected_component(masked_prob, selection,
                                                        num_iter)
        eroded = (eroded > 0.5).astype(jnp.float32)
    opened = dilation(eroded, kernel)
    return opened * prob_mask
