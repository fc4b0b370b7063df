"""Worker for the REAL 2-process CLI scale-out test (test_multihost.py).

argv: pid num_processes port workdir model_id tag

Runs the three production scale-out CLIs, in order, inside the shared
synthetic data root at ``workdir``:

  1. ``cli.generate_img_embeddings`` — via its OWN ``--multihost
     --coordinator ...`` flag path (cli/common.py:setup_backend), each
     process encoding a strided slice and writing ``<out>.part<p>``;
     process 0 then merges through the ``--merge_shards`` CLI path;
  2. ``cli.save_refined_segmentations`` — process-strided file shard
     (save_refined_segmentations.py:105) writing mask ``.part<p>`` files;
  3. ``cli.amg`` — strided targets (amg.py:110), per-image output dirs.

With ``num_processes == 1`` the same script produces the single-process
reference outputs (no distributed init), so the parent test compares
bit-identical artifacts between a genuine 1-process run and a genuine
2-process gloo run — no monkeypatched ``jax.process_count``.
"""

import os
import sys

pid, nproc, port, workdir, model_id, tag = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], sys.argv[6])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.chdir(workdir)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# --multihost flags exercise the real CLI distributed-init path; only the
# FIRST CLI call may carry them (initialize must run exactly once).
mh = [] if nproc == 1 else [
    "--multihost", "--coordinator", f"localhost:{port}",
    "--num_processes", str(nproc), "--process_id", str(pid)]


def barrier(name):
    if nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


from samcarriestheburden_tpu.cli import (amg,  # noqa: E402
                                         generate_img_embeddings,
                                         save_refined_segmentations)

emb = f"data/emb_{tag}.h5"
generate_img_embeddings.main(
    ["--checkpoint", "data/tiny.npz", "--model_type", "vit_t",
     "--output", emb, "--batch_size", "1", "--dtype", "float32", *mh])
assert jax.process_count() == nproc

barrier("embeddings_written")
if nproc > 1 and pid == 0:
    generate_img_embeddings.main(["--merge_shards", "--output", emb])
barrier("embeddings_merged")

save_refined_segmentations.main(
    ["--model_id", model_id, "--n_files", "500",
     "--sam_checkpoint", "data/tiny.npz", "--sam_model_type", "vit_t",
     "--embeddings", emb, "--img_batch", "1"])
barrier("sweep_written")

amg.main(["--checkpoint", "data/tiny.npz", "--model-type", "vit_t",
          "--input", "data/amg_in", "--output", f"out_amg_{tag}",
          "--points-per-side", "2", "--pred-iou-thresh", "-100",
          "--stability-score-thresh", "0"])
barrier("amg_written")

print(f"RESULT p{pid} {tag} done", flush=True)
