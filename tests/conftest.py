"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the JAX idiom for exercising multi-device sharding without TPU
hardware; the driver separately dry-runs the multi-chip path via
``__graft_entry__.dryrun_multichip``."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend via
# jax.config.update('jax_platforms', 'axon,cpu'), overriding the env var —
# override it back: tests are CPU-only, deterministic fp32.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Two-tier suite (SURVEY §4 test strategy): the fast tier (`-m "not slow"`)
# covers every op/module contract in CI time; the slow tier runs the heavy
# e2e paths (training loops, CLI pipelines, AMG, compile-bound entry checks).
_SLOW_MODULES = {
    "test_training", "test_cli", "test_predictor_amg", "test_models_parity",
    "test_kernels", "test_graft_entry", "test_embeddings_export",
}
_SLOW_TESTS = {
    "test_refiner_batched_matches_sequential_reference_protocol",
    "test_batched_decode_logits_match_sequential",
    "test_decoder_head_predict_mask",
    "test_seg_enhance_pipeline",
    "test_preprocess_study_end_to_end",
    "test_sam_refine_study_end_to_end",
    "test_rndwalk_study_end_to_end",
    "test_decoder_graph_dynamic_axes",
    "test_export_decoder_cli_onnx",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SLOW_MODULES
                or item.originalname in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def data_root(tmp_path):
    """Synthetic GrazPedWri-style data root matching the reference's file
    conventions (dataset.csv, pre-flipped PNGs, CVAT XML splits, CSVs)."""
    import cv2
    import pandas as pd

    root = tmp_path / "data"
    (root / "img_only_front_all_left").mkdir(parents=True)
    (root / "cvat_annotation_xml").mkdir()
    rng = np.random.default_rng(0)

    stems = [f"img{i:03d}" for i in range(6)]
    for s in stems:
        img = rng.integers(0, 255, (200, 120)).astype(np.uint8)
        cv2.imwrite(str(root / "img_only_front_all_left" / f"{s}.png"), img)

    pd.DataFrame({
        "filestem": stems,
        "projection": [1, 1, 1, 1, 0, 1],  # img004 is lateral -> excluded
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
    return root
