"""The composed static-shape postprocess must match the literal torch chain
bilinear(256->1024) -> crop -> bilinear(->original) -> threshold ->
nearest-exact(->grid) used by the reference (sam.py:154-161 +
seg_refinement.py:111)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from samcarriestheburden_tpu.engine.postprocess import postprocess_to_grid


def torch_chain(low_res, input_size, original_size, out_hw, img_enc=1024):
    x = torch.from_numpy(low_res)
    x = F.interpolate(x, (img_enc, img_enc), mode="bilinear", align_corners=False)
    x = x[..., : input_size[0], : input_size[1]]
    x = F.interpolate(x, tuple(original_size), mode="bilinear", align_corners=False)
    x = (x > 0.0).float()
    x = F.interpolate(x, out_hw, mode="nearest-exact")
    return x.numpy() > 0.5


@pytest.mark.parametrize("input_size,original_size", [
    ((1024, 597), (2940, 1716)),
    ((683, 1024), (600, 900)),
    ((1024, 1024), (1024, 1024)),
])
def test_matches_torch_chain(rng, input_size, original_size):
    low_res = (rng.standard_normal((2, 1, 256, 256)) * 4).astype(np.float32)
    ours = np.asarray(postprocess_to_grid(
        low_res, np.asarray(input_size), np.asarray(original_size), (384, 224)))
    theirs = torch_chain(low_res, input_size, original_size, (384, 224))
    agree = (ours == theirs).mean()
    assert agree > 0.9995, f"agreement {agree}"


def test_small_config(rng):
    """Tiny SAM: 32² low-res, 128 encoder size."""
    low_res = (rng.standard_normal((3, 1, 32, 32)) * 4).astype(np.float32)
    ours = np.asarray(postprocess_to_grid(
        low_res, np.asarray((128, 75)), np.asarray((256, 150)), (64, 48),
        img_enc_size=128))
    theirs = torch_chain(low_res, (128, 75), (256, 150), (64, 48), img_enc=128)
    assert (ours == theirs).mean() > 0.999


def test_single_program_many_sizes(rng):
    """One compiled program serves every image size (traced scalars)."""
    low_res = rng.standard_normal((1, 1, 256, 256)).astype(np.float32)
    f = postprocess_to_grid
    out1 = f(low_res, np.asarray((1024, 700)), np.asarray((2000, 1300)), (384, 224))
    before = f._cache_size()
    out2 = f(low_res, np.asarray((900, 1024)), np.asarray((1750, 2000)), (384, 224))
    assert out1.shape == out2.shape == (1, 1, 384, 224)
    # second size pair reuses the same trace -> no new cache entry
    assert f._cache_size() == before
