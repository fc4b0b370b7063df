"""Export the prompt-encoder + mask-decoder for deployment
(reference scripts/export_onnx_model.py).

Two formats:

* ``--format stablehlo`` (default) — serialise via ``jax.export`` for PJRT
  runtimes (TPU/GPU/CPU), with shape polymorphism and optional bf16/int8
  weight quantization.
* ``--format onnx`` — a consumable opset-17 ``.onnx`` artifact with the
  reference's SamOnnxModel interface (dynamic batch/point axes), emitted by
  the dependency-free graph builder in export/onnx_graph.py and validated
  against the eager jax program by the numpy evaluator (the analogue of the
  reference's onnxruntime round-trip, export_onnx_model.py:161-167).

python -m samcarriestheburden_tpu.cli.export_decoder \\
    --checkpoint <ckpt> --model-type vit_h --output decoder.onnx --format onnx

The reference's ``--gelu-approx`` flag (export_onnx_model.py:117-120, swaps
erf GELU for the tanh approximation because some ONNX runtimes lack
``Erf``) is deliberately NOT carried: StableHLO consumers lower ``erf``
natively and ``Erf`` is core ONNX since opset 9 — the swap would only add
avoidable drift.
"""

from __future__ import annotations

import argparse

# the SamOnnxModel input interface, in positional order
_INPUT_NAMES = ("image_embeddings", "point_coords", "point_labels",
                "mask_input", "has_mask_input", "orig_im_size")


def _validation_inputs(model, b, n):
    """Seeded random decoder inputs at batch ``b`` / ``n`` points."""
    import numpy as np

    emb = model.cfg.prompt_encoder.image_embedding_size
    g4 = emb[0] * 4
    td = model.cfg.mask_decoder.transformer_dim
    rng = np.random.default_rng(0)
    return (
        rng.standard_normal((1, td, *emb)).astype(np.float32),
        rng.uniform(0, model.img_size, (b, n, 2)).astype(np.float32),
        np.ones((b, n), np.int32),
        np.zeros((b, 1, g4, g4), np.float32),
        np.zeros((b,), np.float32),
        np.asarray([600, 800], np.int32),
    )


def _output_names(return_extra_metrics):
    names = ["masks", "prepadded_size", "iou_predictions"]
    if return_extra_metrics:
        names += ["stability_scores", "areas"]
    return names + ["low_res_masks"]


def _reference_outputs(model, args, test_args):
    import jax.numpy as jnp

    from samcarriestheburden_tpu.export.stablehlo import make_decoder_fn

    fn = make_decoder_fn(model, args.return_single_mask,
                         args.use_stability_score, args.return_extra_metrics)
    return fn(model.params, *map(jnp.asarray, test_args))


def _check_outputs(model, got, ref, names, quantize, artifact):
    """The shared validation contract for both export formats: exact
    (atol/rtol 1e-4) without quantization; ≥99% thresholded-mask agreement
    with it (the reference accepts quantized drift the same way,
    scripts/export_onnx_model.py:187-201)."""
    import numpy as np

    if quantize is None:
        for name, r in zip(names, ref):
            np.testing.assert_allclose(got[name], np.asarray(r),
                                       atol=1e-4, rtol=1e-4)
        print(f"validation OK: {artifact} matches eager outputs")
    else:
        thr = model.mask_threshold
        agree = ((got["masks"] > thr) == (np.asarray(ref[0]) > thr)).mean()
        if agree < 0.99:
            raise RuntimeError(
                f"quantized {artifact} mask agreement {agree:.4f} < 0.99")
        print(f"validation OK: {quantize} {artifact} masks agree with fp32 "
              f"at {agree:.4%} of pixels")


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export the SAM prompt encoder and mask decoder.")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="The path to the SAM model checkpoint.")
    p.add_argument("--output", type=str, required=True,
                   help="The filename to save the exported program to.")
    p.add_argument("--format", choices=["stablehlo", "onnx"],
                   default="stablehlo",
                   help="stablehlo for PJRT runtimes; onnx for an "
                        "onnxruntime/web-consumable artifact")
    p.add_argument("--model-type", type=str, required=True,
                   help="In ['default', 'vit_h', 'vit_l', 'vit_b', 'vit_t'].")
    p.add_argument("--return-single-mask", action="store_true",
                   help="Return only the best mask (score-reweight selection).")
    p.add_argument("--use-stability-score", action="store_true",
                   help="Replace the IoU head scores with stability scores.")
    p.add_argument("--return-extra-metrics", action="store_true")
    p.add_argument("--batch", type=int, default=None,
                   help="Static batch size (default: symbolic)")
    p.add_argument("--num-points", type=int, default=None,
                   help="Static point count (default: symbolic)")
    p.add_argument("--quantize", choices=["bf16", "int8"], default=None,
                   help="Weight quantization for the exported artifact "
                        "(reference's dynamic uint8 ONNX quantization analogue)")
    p.add_argument("--validate", action="store_true",
                   help="Round-trip the serialized program and check outputs")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    # flag validation that depends only on args runs BEFORE the (potentially
    # multi-GB) checkpoint load
    if args.format == "onnx":
        if args.quantize == "bf16":
            p.error("--format onnx supports --quantize int8 (in-graph "
                    "DequantizeLinear, the reference's quantize_dynamic "
                    "analogue); bf16 is a stablehlo mode")
        if args.batch is not None or args.num_points is not None:
            p.error("--format onnx always exports dynamic batch/point axes")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from samcarriestheburden_tpu.export.stablehlo import (
        export_decoder, load_exported)
    from samcarriestheburden_tpu.models.build import sam_model_registry

    print("Loading model...")
    model = sam_model_registry[args.model_type](checkpoint=args.checkpoint)

    if args.format == "onnx":
        from samcarriestheburden_tpu.export.onnx_graph import \
            export_decoder_onnx

        path = export_decoder_onnx(
            model, args.output, return_single_mask=args.return_single_mask,
            use_stability_score=args.use_stability_score,
            return_extra_metrics=args.return_extra_metrics,
            quantize=args.quantize)
        print(f"wrote {path} ({path.stat().st_size} bytes)")
        if args.validate:
            from samcarriestheburden_tpu.export.onnx_eval import \
                evaluate_model

            test_args = _validation_inputs(model, 1, 2)
            feeds = dict(zip(_INPUT_NAMES, test_args))
            # the ONNX interface takes labels as float (SamOnnxModel)
            feeds["point_labels"] = feeds["point_labels"].astype(np.float32)
            got = evaluate_model(path.read_bytes(), feeds)
            ref = _reference_outputs(model, args, test_args)
            _check_outputs(model, got, ref,
                           _output_names(args.return_extra_metrics),
                           args.quantize, "parsed .onnx graph")
        return path

    path = export_decoder(model, args.output,
                          return_single_mask=args.return_single_mask,
                          use_stability_score=args.use_stability_score,
                          return_extra_metrics=args.return_extra_metrics,
                          batch=args.batch, num_points=args.num_points,
                          quantize=args.quantize)
    print(f"wrote {path} ({path.stat().st_size} bytes)")

    if args.validate:
        exported = load_exported(path)
        test_args = _validation_inputs(model, args.batch or 1,
                                       args.num_points or 2)
        outs = exported.call(*test_args)
        names = _output_names(args.return_extra_metrics)
        got = {k: np.asarray(v) for k, v in zip(names, outs)}
        ref = _reference_outputs(model, args, test_args)
        _check_outputs(model, got, ref, names, args.quantize,
                       "deserialized program")


if __name__ == "__main__":
    main()
