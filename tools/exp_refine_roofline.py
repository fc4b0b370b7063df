"""Roofline arithmetic for the refine-decode leg (round-4 VERDICT #7).

The BENCHMARKS.md claim that the refine leg's ~6.5% MFU is an HBM-bound
FLOOR was a trace anecdote; this experiment computes it: XLA's own
'bytes accessed' for the 17-class 2-round decode program (the bench refine
leg) divided by measured wall time = achieved HBM bandwidth, compared to
the v5e spec (819 GB/s).  Also prints the hand-counted dominant tensors per
round so the byte total is auditable, and the arithmetic-intensity bound:
    max_FLOPs = bytes x (peak_FLOP/s / peak_B/s)
If achieved bandwidth is within ~2x of spec, "floor" is a computed bound.

Run on the TPU:  python tools/exp_refine_roofline.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

V5E_HBM_GBPS = 819.0   # v5e spec sheet
V5E_BF16_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from bench import _time_it, _xla_cost
    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.config import N_CLASSES
    from samcarriestheburden_tpu.models import mask_decoder, prompt_encoder
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = _config.sam_vit_h_config()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params_all = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    model = SamModel(cfg=cfg, params=params_all)
    size = model.img_size
    grid = cfg.prompt_encoder.image_embedding_size[0]
    rng = np.random.default_rng(0)
    params = jax.tree.map(jnp.asarray, {
        "prompt_encoder": model.params["prompt_encoder"],
        "mask_decoder": model.params["mask_decoder"],
    })
    n_points = 1 + (N_CLASSES - 1) + 1

    @jax.jit
    def refine(features, coords, labels):
        sparse = prompt_encoder.embed_unified_points(
            params["prompt_encoder"], cfg.prompt_encoder, coords, labels)
        image_pe = prompt_encoder.get_dense_pe(params["prompt_encoder"],
                                               cfg.prompt_encoder)
        dense = prompt_encoder.no_mask_dense(params["prompt_encoder"],
                                             cfg.prompt_encoder, 1)
        low1, _ = mask_decoder.apply(params["mask_decoder"], cfg.mask_decoder,
                                     features, image_pe, sparse, dense, False,
                                     image_shared=True)
        dense2 = prompt_encoder.embed_masks(params["prompt_encoder"],
                                            cfg.prompt_encoder, low1)
        return mask_decoder.apply(params["mask_decoder"], cfg.mask_decoder,
                                  features, image_pe, sparse, dense2, False)

    features = jnp.asarray(rng.standard_normal(
        (1, cfg.mask_decoder.transformer_dim, grid, grid)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0, size, (N_CLASSES, n_points, 2)),
                         jnp.float32)
    labels = jnp.concatenate([
        jnp.ones((N_CLASSES, 1), jnp.int32),
        jnp.zeros((N_CLASSES, N_CLASSES - 1), jnp.int32),
        -jnp.ones((N_CLASSES, 1), jnp.int32)], axis=1)

    ca = _xla_cost(refine, features, coords, labels)
    if ca is None or "flops" not in ca or "bytes accessed" not in ca:
        sys.exit("cost analysis unavailable on this backend (needs TPU "
                 "cost_analysis with flops + 'bytes accessed')")
    t = _time_it(refine, features, coords, labels, iters=5, warmup=2)
    flops = float(ca["flops"])
    bytes_ = float(ca["bytes accessed"])
    gbps = bytes_ / t / 1e9
    tflops = flops / t / 1e12
    print(f"refine 17-class 2-round: t = {t*1e3:.2f} ms")
    print(f"  XLA flops          = {flops/1e9:.2f} GFLOP "
          f"-> {tflops:.2f} TFLOP/s = {100*tflops/V5E_BF16_TFLOPS:.1f}% of "
          f"bf16 peak")
    print(f"  XLA bytes accessed = {bytes_/1e6:.1f} MB "
          f"-> {gbps:.0f} GB/s = {100*gbps/V5E_HBM_GBPS:.1f}% of spec HBM BW")
    ai = flops / bytes_
    ridge = V5E_BF16_TFLOPS * 1e12 / (V5E_HBM_GBPS * 1e9)
    print(f"  arithmetic intensity = {ai:.1f} FLOP/B "
          f"(v5e ridge point = {ridge:.0f} FLOP/B) -> "
          f"{'HBM-BOUND' if ai < ridge else 'compute-bound'}")
    print(f"  bandwidth-implied floor at spec BW: "
          f"{bytes_/(V5E_HBM_GBPS*1e9)*1e3:.2f} ms "
          f"(measured {t*1e3:.2f} ms = "
          f"{t/(bytes_/(V5E_HBM_GBPS*1e9)):.2f}x the floor)")

    # auditable dominant tensors (bf16 decode, B = 17 classes)
    B, C, H = N_CLASSES, cfg.mask_decoder.transformer_dim, grid
    hw = H * H
    it = 2
    up1 = B * (2 * H) * (2 * H) * (C // 4) * it   # convT1 out, r+w
    up2 = B * (4 * H) * (4 * H) * (C // 8) * it   # convT2 out, r+w
    keys = B * hw * C * it                        # image rows per LN/attn pass
    print(f"  hand count (bf16, per round2): keys pass {keys*2/1e6:.0f} MB x "
          f"several, convT1 {up1*2/1e6:.0f} MB, convT2 {up2*2/1e6:.0f} MB, "
          f"masks fp32 {B*4*(4*H)**2*4/1e6:.0f} MB")

    # ---- same arithmetic for the AMG device-batch leg -------------------
    from samcarriestheburden_tpu.ops.mask_ops import (batched_mask_to_box,
                                                      calculate_stability_score)

    ppb = 64

    @jax.jit
    def amg_batch(points, features):
        sparse = prompt_encoder.embed_unified_points(
            params["prompt_encoder"], cfg.prompt_encoder,
            points, jnp.ones(points.shape[:2], jnp.int32))
        image_pe = prompt_encoder.get_dense_pe(params["prompt_encoder"],
                                               cfg.prompt_encoder)
        dense = prompt_encoder.no_mask_dense(params["prompt_encoder"],
                                             cfg.prompt_encoder, 1)
        masks, iou = mask_decoder.apply(
            params["mask_decoder"], cfg.mask_decoder, features, image_pe,
            sparse, dense, True, image_shared=True)
        stab = calculate_stability_score(masks, 0.0, 1.0)
        boxes = batched_mask_to_box(masks > 0)
        return iou, stab, boxes

    pts = jnp.asarray(rng.uniform(0, size, (ppb, 1, 2)), jnp.float32)
    ca2 = _xla_cost(amg_batch, pts, features)
    if ca2 is None or "flops" not in ca2 or "bytes accessed" not in ca2:
        sys.exit("cost analysis unavailable for the AMG program")
    t2 = _time_it(amg_batch, pts, features, iters=5, warmup=2)
    b2 = float(ca2["bytes accessed"])
    f2 = float(ca2["flops"])
    print(f"AMG batch ({ppb} points, multimask): t = {t2*1e3:.2f} ms")
    print(f"  XLA flops = {f2/1e9:.2f} GFLOP -> "
          f"{f2/t2/1e12:.2f} TFLOP/s = "
          f"{100*f2/t2/1e12/V5E_BF16_TFLOPS:.1f}% of bf16 peak")
    print(f"  XLA bytes = {b2/1e6:.1f} MB -> {b2/t2/1e9:.0f} GB/s = "
          f"{100*b2/t2/1e9/V5E_HBM_GBPS:.1f}% of spec HBM BW; "
          f"intensity {f2/b2:.1f} FLOP/B "
          f"({'HBM-BOUND' if f2/b2 < 241 else 'compute-bound'})")


if __name__ == "__main__":
    main()
