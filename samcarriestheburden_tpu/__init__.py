"""samcarriestheburden_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
"SAM Carries the Burden" semi-supervised medical-segmentation framework.

The reference (multimodallearning/SamCarriesTheBurden) is a single-GPU
PyTorch pipeline: an initial U-Net is trained on 64 annotated wrist X-rays,
its predictions on ~500 unlabelled images are refined with the Segment
Anything Model via automatically extracted prompts, and a final U-Net is
trained on the refined pseudo labels.

This package re-designs every component TPU-first:

* functional model cores (pure ``init``/``apply`` with pytree params) that
  compile end-to-end under ``jax.jit``,
* static shapes everywhere (padded prompt batches + validity masks instead of
  data-dependent filtering),
* ``vmap`` where the reference loops in Python (per-class prompts, AMG point
  batches),
* ``jax.sharding.Mesh`` + ``pjit`` data parallelism for embedding precompute
  and U-Net training,
* Pallas kernels for the hottest op (windowed ViT attention with decomposed
  relative-position bias).

Public API parity with the reference (``sam_model_registry``, ``SamPredictor``,
``SamAutomaticMaskGenerator``, ``SamMaskDecoderHead``, ...) is preserved so a
user of the reference can switch directly.
"""

from samcarriestheburden_tpu.version import __version__  # noqa: F401

_LAZY = {
    "build_sam_vit_b": "samcarriestheburden_tpu.models.build",
    "build_sam_vit_l": "samcarriestheburden_tpu.models.build",
    "build_sam_vit_h": "samcarriestheburden_tpu.models.build",
    "build_sam_vit_t": "samcarriestheburden_tpu.models.build",
    "sam_model_registry": "samcarriestheburden_tpu.models.build",
    "SamPredictor": "samcarriestheburden_tpu.engine.predictor",
    "SamAutomaticMaskGenerator": "samcarriestheburden_tpu.engine.amg",
    "SamMaskDecoderHead": "samcarriestheburden_tpu.engine.decoder_head",
    # reference spelling (sam_mask_decoder_head.py:12)
    "SAMMaskDecoderHead": "samcarriestheburden_tpu.engine.decoder_head",
}


def __getattr__(name):
    """Lazy public API (PEP 562) so light ops imports don't pull in models."""
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        attr = name if name != "SAMMaskDecoderHead" else "SamMaskDecoderHead"
        value = getattr(mod, attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["__version__", *_LAZY]
