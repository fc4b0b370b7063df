"""On-hardware parity check: serving encoder with compact_windows on vs off
(bf16, no quantization) on the REAL Mosaic kernels — complements the
interpret-mode test in tests/test_kernels.py."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.engine.embeddings import make_serving_encoder
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = _config.sam_vit_b_config()  # smaller = faster compile, same layout
    params = sam_init(jax.random.PRNGKey(0), cfg)
    model = SamModel(cfg=cfg, params=params)
    size = model.img_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 3, size, size)), jnp.uint8)
    sizes = jnp.asarray([[size, int(size * 0.7)], [700, 1024]], jnp.int32)

    outs = {}
    for compact in (False, True):
        encode, ep = make_serving_encoder(model, jnp.bfloat16,
                                          compact_windows=compact)
        outs[compact] = np.asarray(encode(ep, imgs, sizes), np.float32)
    a, b = outs[False], outs[True]
    denom = np.abs(a).mean()
    print(f"max|diff|={np.abs(a - b).max():.5f}  "
          f"mean|diff|={np.abs(a - b).mean():.6f}  "
          f"mean|ref|={denom:.4f}  "
          f"rel={np.abs(a - b).mean() / denom:.2e}")


if __name__ == "__main__":
    main()
