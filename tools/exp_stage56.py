"""Scratch experiment: how fast does a tiny U-Net learn the injected GT-quality
pseudo label in the stage-5/6 closure test, and what val dice does it reach?
(tuning tests/test_cli.py::test_pseudo_label_retraining_closes_the_pipeline)"""

import os
import sys
import tempfile
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from samcarriestheburden_tpu import config as cfgmod

# tiny defaults, as the test monkeypatches them (dataclass defaults are baked
# into __init__, so patch the NAME the CLI resolves at call time; keep
# from_json so modelio can reconstruct saved configs)
_orig_unet_config = cfgmod.UNetConfig


def _tiny_unet_config(**kw):
    kw.setdefault("base_channels", 4)
    kw.setdefault("n_last_channel", 4)
    return _orig_unet_config(**kw)


_tiny_unet_config.from_json = _orig_unet_config.from_json
cfgmod.UNetConfig = _tiny_unet_config

# build the synthetic data root exactly like conftest
import cv2
import pandas as pd

tmp = tempfile.mkdtemp()
root = Path(tmp) / "data"
(root / "img_only_front_all_left").mkdir(parents=True)
(root / "cvat_annotation_xml").mkdir()
rng = np.random.default_rng(0)
stems = [f"img{i:03d}" for i in range(6)]
for s in stems:
    img = rng.integers(0, 255, (200, 120)).astype(np.uint8)
    cv2.imwrite(str(root / "img_only_front_all_left" / f"{s}.png"), img)
pd.DataFrame({
    "filestem": stems,
    "projection": [1, 1, 1, 1, 0, 1],
    "lateralproj": [0] * 6,
    "laterality": ["L", "R", "L", "L", "L", "L"],
}).set_index("filestem").to_csv(root / "dataset.csv")


def img_el(i, s):
    return f'''  <image id="{i}" name="{s}.png" width="120" height="200">
    <polygon label="Knochen" points="10.0,20.0;60.0,20.0;60.0,90.0;10.0,90.0" z_order="0">
      <attribute name="Anatomie">Radius</attribute>
    </polygon>
    <mask label="Knochen" top="100" left="30" width="4" height="2" rle="1,6,1" z_order="0">
      <attribute name="Anatomie">Ulna</attribute>
    </mask>
  </image>'''


xml = ('<?xml version="1.0" encoding="utf-8"?>\n<annotations>\n'
       + "\n".join(img_el(i, s) for i, s in enumerate(stems[:3]))
       + "\n</annotations>")
(root / "cvat_annotation_xml" / "annotations_train1.xml").write_text(xml)
val_xml = ('<?xml version="1.0" encoding="utf-8"?>\n<annotations>\n'
           + img_el(0, stems[3]) + "\n</annotations>")
(root / "cvat_annotation_xml" / "annotations_val.xml").write_text(val_xml)
pd.DataFrame({"file_stem": stems[:3]}).to_csv(
    root / "successively_training_files_order.csv")
pd.DataFrame({"filestem": [stems[5]]}).to_csv(root / "500unlabeled_sample.csv")

os.chdir(tmp)

from samcarriestheburden_tpu.cli import train, train_on_pseudo_labels
from samcarriestheburden_tpu.data.datasets import LightSegGrazPedWriDataset
from samcarriestheburden_tpu.data.h5io import MaskWriter
from samcarriestheburden_tpu.models.modelio import ModelRegistry

theta_id = train.main(["--epochs", "1", "--data_sample_per_epoch", "2",
                       "--batch_size", "2", "--n_last_channel", "4",
                       "--data_aug", "0"])
registry = ModelRegistry(root / "model_registry")
theta_dice = {r["id"]: r for r in registry.list()}[theta_id]["val_dice"]
print(f"theta val_dice = {theta_dice}")

# inject GT-quality pseudo labels for img005 directly
_, y_va, _ = LightSegGrazPedWriDataset("val", data_root=root).as_arrays()
gt = (np.asarray(y_va[0]) > 0.5).astype(np.uint8)
out = root / "seg_masks" / theta_id / "sam_box_refine_pos_points_neg_points_500.h5"
out.parent.mkdir(parents=True, exist_ok=True)
with MaskWriter(out, attrs={"model_id": theta_id}) as w:
    w.write("img005", gt, estimated_dice=np.full(17, 0.9, np.float32))

common = ["--model_id", theta_id, "--pseudo_label", "sam",
          "--prompt1st", "box", "--prompt2nd", "pos_points", "neg_points",
          "--pseudo_label_suffix", "500", "--batch_size", "1",
          "--data_aug", "0"]
for extra in (["--epochs", "40"],
              ["--epochs", "15", "--no-train_from_scratch"],
              ["--epochs", "30", "--no-train_from_scratch"]):
    phi_id = train_on_pseudo_labels.main(common + extra)
    phi = {r["id"]: r for r in registry.list()}[phi_id]
    print(f"{extra}: phi val_dice = {phi['val_dice']}, "
          f"initial_model = {phi.get('initial_model')}", flush=True)
