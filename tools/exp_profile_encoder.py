"""Device-trace the serving encoder (compact on/off) and print the top ops
by self time, parsed from the jax.profiler trace JSON."""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def run(compact):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from samcarriestheburden_tpu import config as _config
    from samcarriestheburden_tpu.engine.embeddings import make_serving_encoder
    from samcarriestheburden_tpu.models.sam import SamModel, init as sam_init

    cfg = _config.sam_vit_h_config()
    shapes = jax.eval_shape(lambda k: sam_init(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    model = SamModel(cfg=cfg, params=params)
    size = model.img_size
    rng = np.random.default_rng(0)
    encode, eparams = make_serving_encoder(model, jnp.bfloat16,
                                           quantize="int8",
                                           compact_windows=compact)
    imgs = jnp.asarray(rng.integers(0, 255, (32, 3, size, size)), jnp.uint8)
    sizes = jnp.tile(jnp.asarray([[size, int(size * 0.7)]], jnp.int32),
                     (32, 1))
    out = encode(eparams, imgs, sizes)
    jax.block_until_ready(out)
    tag = "on" if compact else "off"
    tdir = f"/tmp/prof_enc_{tag}"
    with jax.profiler.trace(tdir):
        for _ in range(2):
            out = encode(eparams, imgs, sizes)
        jax.block_until_ready(out)
    return tdir


def top_ops(tdir, k=18):
    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    ev = json.loads(gzip.open(path).read()).get("traceEvents", [])
    # device-lane complete events: sum durations by op name
    agg = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and e.get("dur"):
            name = e.get("name", "")
            pid_name = e.get("pid")
            agg[name] += e["dur"]
    items = sorted(agg.items(), key=lambda x: -x[1])
    total = sum(v for _, v in items)
    print(f"== {tdir} (total {total/1e3:.1f} ms across lanes)")
    for name, dur in items[:k]:
        print(f"  {dur/1e3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    compact = sys.argv[1] == "on"
    tdir = run(compact)
    top_ops(tdir)
