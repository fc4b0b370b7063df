"""Export the prompt-encoder + mask-decoder as a StableHLO program
(reference scripts/export_onnx_model.py, ONNX → StableHLO).

python -m samcarriestheburden_tpu.cli.export_decoder \\
    --checkpoint <ckpt> --model-type vit_h --output decoder.stablehlo

The reference's ``--gelu-approx`` flag (export_onnx_model.py:117-120, swaps
erf GELU for the tanh approximation because some ONNX runtimes lack
``Erf``) is deliberately NOT carried: StableHLO consumers lower ``erf``
natively, so the exported program keeps exact-GELU numerics — the swap
would only add avoidable drift.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export the SAM prompt encoder and mask decoder to StableHLO.")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="The path to the SAM model checkpoint.")
    p.add_argument("--output", type=str, required=True,
                   help="The filename to save the StableHLO program to.")
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
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from samcarriestheburden_tpu.export.stablehlo import (
        export_decoder, load_exported, make_decoder_fn)
    from samcarriestheburden_tpu.models.build import sam_model_registry

    print("Loading model...")
    model = sam_model_registry[args.model_type](checkpoint=args.checkpoint)
    path = export_decoder(model, args.output,
                          return_single_mask=args.return_single_mask,
                          use_stability_score=args.use_stability_score,
                          return_extra_metrics=args.return_extra_metrics,
                          batch=args.batch, num_points=args.num_points,
                          quantize=args.quantize)
    print(f"wrote {path} ({path.stat().st_size} bytes)")

    if args.validate:
        import jax.numpy as jnp

        exported = load_exported(path)
        emb = model.cfg.prompt_encoder.image_embedding_size
        g4 = emb[0] * 4
        td = model.cfg.mask_decoder.transformer_dim
        b, n = args.batch or 1, args.num_points or 2
        rng = np.random.default_rng(0)
        test_args = (
            rng.standard_normal((1, td, *emb)).astype(np.float32),
            rng.uniform(0, model.img_size, (b, n, 2)).astype(np.float32),
            np.ones((b, n), np.int32),
            np.zeros((b, 1, g4, g4), np.float32),
            np.zeros((b,), np.float32),
            np.asarray([600, 800], np.int32),
        )
        outs = exported.call(*test_args)
        fn = make_decoder_fn(model, args.return_single_mask,
                             args.use_stability_score, args.return_extra_metrics)
        ref = fn(model.params, *map(jnp.asarray, test_args))
        if args.quantize is None:
            for o, r in zip(outs, ref):
                np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)
            print("validation OK: deserialized program matches eager outputs")
        else:
            # quantized weights shift logits; contract = thresholded masks agree
            thr = model.mask_threshold
            m_q = np.asarray(outs[0]) > thr
            m_f = np.asarray(ref[0]) > thr
            agree = (m_q == m_f).mean()
            assert agree >= 0.99, f"quantized mask agreement {agree:.4f} < 0.99"
            print(f"validation OK: {args.quantize} masks agree with fp32 at "
                  f"{agree:.4%} of pixels")


if __name__ == "__main__":
    main()
