"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a global
4-device data mesh.  Runs one real U-Net training epoch through UNetTrainer
with both dataset placements and prints the losses for cross-process /
single-process comparison.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from samcarriestheburden_tpu.parallel import distributed  # noqa: E402

distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert distributed.is_multiprocess()
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import numpy as np  # noqa: E402

from samcarriestheburden_tpu.config import TrainConfig, UNetConfig  # noqa: E402
from samcarriestheburden_tpu.parallel import mesh as pmesh  # noqa: E402
from samcarriestheburden_tpu.train.loop import UNetTrainer  # noqa: E402

mesh = pmesh.make_mesh()  # global: all 4 devices
rng = np.random.default_rng(0)  # identical data on every process
x = rng.random((8, 1, 32, 24)).astype(np.float32)
y = (rng.random((8, 17, 32, 24)) > 0.7).astype(np.float32)

for placement in ("replicated", "sharded"):
    cfg = TrainConfig(epochs=1, batch_size=4, data_sample_per_epoch=8,
                      data_aug=0.0, data_placement=placement, epoch_scan=False)
    trainer = UNetTrainer(UNetConfig(n_channels=1, n_classes=17,
                                     base_channels=4, n_last_channel=4),
                          cfg, mesh=mesh)
    loss, _ = trainer.train_epoch(x, y, epoch=0)
    print(f"RESULT p{pid} {placement} {loss:.10f}", flush=True)
