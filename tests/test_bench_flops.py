"""Calibration of the bench MFU instrument (round-4 VERDICT #2).

Pins XLA's flop-count convention with known programs so the published MFU
figures rest on a verified instrument:
* a known (m,k)@(k,n) matmul counts 2·m·n·k;
* a lax.scan body is counted ONCE regardless of trip count — the round-4
  2.268 TFLOP/img encoder figure was exactly this undercount (the ViT-H
  windowed layers run as per-run scans), which is why bench.py now uses
  the analytic count for the encoder MFU;
* the analytic encoder formula matches XLA's count of the UNROLLED tiny
  encoder within the padding/rel-pos overhead margin.
"""

import numpy as np
import pytest


def test_xla_flops_matmul_is_2mnk():
    import jax.numpy as jnp

    from bench import _xla_flops

    m, k, n = 64, 128, 256
    a = jnp.zeros((m, k), jnp.float32)
    b = jnp.zeros((k, n), jnp.float32)
    f = _xla_flops(lambda a, b: a @ b, a, b)
    assert f is not None
    assert f == pytest.approx(2 * m * n * k, rel=0.01)


def test_xla_flops_conv_is_2mnk():
    import jax
    import jax.numpy as jnp

    from bench import _xla_flops

    pix, cin, cout = 128, 32, 64
    x = jnp.zeros((1, 16, 8, cin), jnp.float32)
    w = jnp.zeros((1, 1, cin, cout), jnp.float32)
    f = _xla_flops(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w)
    assert f == pytest.approx(2 * pix * cin * cout, rel=0.01)


def test_xla_flops_scan_body_counted_once():
    """The undercount that corrupted the round-4 headline MFU: scan(n) of a
    matmul body reports the SINGLE-body flops, unrolled(n) reports n x."""
    import jax
    import jax.numpy as jnp

    from bench import _xla_flops

    w = jnp.zeros((64, 64), jnp.float32)
    x = jnp.zeros((32, 64), jnp.float32)
    one = 2 * 32 * 64 * 64

    def scanned(x):
        return jax.lax.scan(lambda c, _: (c @ w, None), x, None, length=8)[0]

    def unrolled(x):
        for _ in range(8):
            x = x @ w
        return x

    fs = _xla_flops(scanned, x)
    fu = _xla_flops(unrolled, x)
    assert fs == pytest.approx(one, rel=0.05), "scan body counted once"
    assert fu == pytest.approx(8 * one, rel=0.05), "unrolled counts all"


def test_flops_convention_check_runs():
    from bench import flops_convention_check

    c = flops_convention_check()
    assert c["ok"], c
    assert c["scan_body_counted_once"] is True
    # CPU has no Pallas lowering; the TPU bench run records True there
    assert c["pallas_cost_estimate_counted"] is None


def test_analytic_encoder_flops_matches_unrolled_xla_count():
    """The analytic 2mnk formula vs XLA's count of the UNROLLED tiny encoder
    (scan_blocks=False, so nothing is hidden).  XLA counts slightly MORE:
    elementwise work plus the real extra MXU work of the fused-qkv padding
    and rel-pos terms — so the analytic number is a conservative (lower)
    MFU numerator.  Bound the ratio."""
    import jax
    import jax.numpy as jnp

    from bench import _xla_flops, analytic_encoder_flops
    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.models import image_encoder
    from samcarriestheburden_tpu.models.sam import init as sam_init

    cfg = _config.sam_vit_t_config()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    x = jnp.zeros((1, 3, cfg.image_encoder.img_size,
                   cfg.image_encoder.img_size), jnp.float32)
    f_xla = _xla_flops(
        lambda p, x: image_encoder.apply(p, cfg.image_encoder, x,
                                         scan_blocks=False),
        params["image_encoder"], x)
    f_analytic = analytic_encoder_flops(cfg, compact=False)
    assert f_xla is not None
    ratio = f_xla / f_analytic
    assert 1.0 <= ratio < 2.0, \
        (f"XLA unrolled {f_xla/1e9:.2f} GF vs analytic "
         f"{f_analytic/1e9:.2f} GF (ratio {ratio:.2f}) — analytic must be "
         f"a lower bound within the known padding overhead")


def test_analytic_encoder_flops_vit_h_magnitude():
    """ViT-H at 1024²: the analytic count must land at the hand-derived
    ~5.7-6.6 TFLOP/img (24·d²·T projections+MLP dominate), NOT the 2.27
    TFLOP the round-4 XLA instrument reported."""
    from bench import analytic_encoder_flops
    from samcarriestheburden_tpu import config as _config

    cfg = _config.sam_vit_h_config()
    flat = analytic_encoder_flops(cfg, compact=False)
    compact = analytic_encoder_flops(cfg, compact=True)
    assert 6.0e12 < flat < 7.0e12, flat
    assert 5.3e12 < compact < 6.2e12, compact
    assert compact < flat  # compact carries 4208 rows vs 4900 padded
