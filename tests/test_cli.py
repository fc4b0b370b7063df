"""CLI smoke tests: --help on every entry point + a miniature end-to-end
train → save_segmentations pipeline over the synthetic data root."""

import contextlib
import io
import os
from pathlib import Path

import numpy as np
import pytest


CLI_MODULES = [
    "train", "train_on_pseudo_labels", "generate_img_embeddings",
    "save_segmentations", "save_refined_segmentations", "amg",
    "export_decoder", "copy_and_process_imgs",
    "define_successively_data_subsets", "sanity_check_saved_segmentation",
    "hpo", "select_pseudo_labels", "make_synthetic_dataset",
    "import_reference_data",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help(name):
    import importlib

    mod = importlib.import_module(f"samcarriestheburden_tpu.cli.{name}")
    buf = io.StringIO()
    with pytest.raises(SystemExit) as exc, contextlib.redirect_stdout(buf):
        mod.main(["--help"])
    assert exc.value.code == 0
    assert "usage" in buf.getvalue().lower()


@pytest.fixture
def in_data_root(data_root, monkeypatch):
    monkeypatch.chdir(data_root.parent)
    return data_root


def test_train_and_save_segmentations_pipeline(in_data_root):
    from samcarriestheburden_tpu.cli import save_segmentations, train
    from samcarriestheburden_tpu.data.h5io import MaskReader

    model_id = train.main(["--epochs", "2", "--data_sample_per_epoch", "4",
                           "--batch_size", "2", "--n_last_channel", "4",
                           "--data_aug", "0", "--profile", "runs/prof_test"])
    assert isinstance(model_id, str) and len(model_id) == 32
    assert (in_data_root / "model_registry" / model_id / "model.npz").exists()

    import json
    phases = json.loads(Path("runs/prof_test/phases.json").read_text())
    assert phases["train_epoch"]["count"] == 2 and "evaluate" in phases

    save_segmentations.main(["--model_id", model_id, "--n_files", "500"])
    out = in_data_root / "seg_masks" / model_id / "raw_segmentations_500.h5"
    assert out.exists()
    reader = MaskReader(out)
    assert reader.stems() == ["img005"]
    assert reader.masks("img005").shape == (17, 384, 224)


@pytest.mark.skipif(not Path("/root/reference/data").exists(),
                    reason="reference checkout not available")
def test_import_reference_data(tmp_path, monkeypatch):
    """The one-command importer copies + validates the reference's pure-data
    conventions (SURVEY #33) so the real pipeline runs without hand-copying."""
    import pandas as pd

    from samcarriestheburden_tpu.cli import import_reference_data as ird

    monkeypatch.chdir(tmp_path)
    out = ird.main(["--reference_root", "/root/reference"])
    df = pd.read_csv(out / "500unlabeled_sample.csv")
    assert len(df) == 500 and "filestem" in df.columns
    assert (out / "successively_training_files_order.csv").exists()
    for split in ("train1", "train2", "val", "test"):
        assert (out / "cvat_annotation_xml" / f"annotations_{split}.xml").exists()


def test_define_successively_subsets(in_data_root):
    # synthetic annotations only cover 2 of 17 classes -> must refuse
    from samcarriestheburden_tpu.cli import define_successively_data_subsets as d

    with pytest.raises(AssertionError):
        d.main([])


def test_registry_roundtrip(tmp_path):
    import jax

    from samcarriestheburden_tpu.config import UNetConfig
    from samcarriestheburden_tpu.models import unet
    from samcarriestheburden_tpu.models.modelio import ModelRegistry, load_model

    cfg = UNetConfig(n_classes=3, base_channels=4, n_last_channel=4)
    params = unet.init(jax.random.PRNGKey(0), cfg)
    reg = ModelRegistry(tmp_path / "registry")
    mid = reg.register(cfg, params, name="m", metadata={"k": 1})
    cfg2, params2 = reg.load(mid)
    assert cfg2 == cfg
    flat = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert all(np.allclose(a, b) for a, b in zip(flat, flat2))
    # same weights -> same content hash
    assert reg.register(cfg, params) == mid
    with pytest.raises(KeyError):
        reg.get_weights("nope")
    assert any(r["id"] == mid for r in reg.list())


def test_amg_cli_end_to_end(tmp_path, monkeypatch):
    """Drive cli.amg with a tiny npz checkpoint over one image."""
    import cv2
    import jax

    from samcarriestheburden_tpu.cli import amg as amg_cli
    from samcarriestheburden_tpu.config import sam_vit_t_config
    from samcarriestheburden_tpu.models.modelio import save_params
    from samcarriestheburden_tpu.models.sam import init as sam_init

    cfg = sam_vit_t_config()
    params = sam_init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "tiny_sam.npz"
    save_params(ckpt, params)

    img = np.zeros((160, 200), np.uint8)
    img[40:120, 60:140] = 220
    img_path = tmp_path / "x.png"
    cv2.imwrite(str(img_path), img)
    out_dir = tmp_path / "out"

    amg_cli.main(["--checkpoint", str(ckpt), "--model-type", "vit_t",
                  "--input", str(img_path), "--output", str(out_dir),
                  "--points-per-side", "2", "--pred-iou-thresh", "-100",
                  "--stability-score-thresh", "0"])
    base = out_dir / "x"
    assert (base / "metadata.csv").exists()
    pngs = list(base.glob("*.png"))
    assert len(pngs) >= 1
    m = cv2.imread(str(pngs[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (160, 200)


def test_select_pseudo_labels(tmp_path, monkeypatch):
    from samcarriestheburden_tpu.cli import select_pseudo_labels as spl
    from samcarriestheburden_tpu.data.h5io import MaskReader, MaskWriter

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    mdir = tmp_path / "data" / "seg_masks" / "mid"
    src = mdir / "sam_box_refine_pos_points_neg_points_500.h5"
    with MaskWriter(src) as w:
        w.write("good", (rng.random((17, 8, 8)) > 0.5).astype(np.uint8),
                estimated_dice=np.full(17, 0.9, np.float32))
        w.write("bad", (rng.random((17, 8, 8)) > 0.5).astype(np.uint8),
                estimated_dice=np.full(17, 0.3, np.float32))
        nanish = np.full(17, 0.85, np.float32)
        nanish[3:] = np.nan  # missing classes don't disqualify
        w.write("partial", (rng.random((17, 8, 8)) > 0.5).astype(np.uint8),
                estimated_dice=nanish)

    out = spl.main(["--model_id", "mid",
                    "--input", "sam_box_refine_pos_points_neg_points_500.h5",
                    "--threshold", "0.8"])
    reader = MaskReader(out, check_labels=False)
    assert sorted(reader.stems()) == ["good", "partial"]
    assert out.name == "selected_pseudo_labels_500_dsc_08.h5"


def test_refined_segmentations_cli_multihost_equivalence(in_data_root, monkeypatch):
    """End-to-end `save_refined_segmentations` over the synthetic data root
    (stages 1+2+4 of the pipeline: train -> embeddings -> refined sweep), then
    the same sweep re-run as two simulated processes (monkeypatched
    jax.process_count/index): the sharded parts, merged with
    merge_mask_shards, must equal the single-process output exactly."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from samcarriestheburden_tpu.cli import save_refined_segmentations, train
    from samcarriestheburden_tpu.config import sam_vit_t_config
    from samcarriestheburden_tpu.data.h5io import (MaskReader,
                                                   merge_mask_shards)
    from samcarriestheburden_tpu.engine.embeddings import precompute_embeddings
    from samcarriestheburden_tpu.models import convert, modelio
    from samcarriestheburden_tpu.models.sam import SamModel

    stems = ["img002", "img003", "img005"]
    pd.DataFrame({"filestem": stems}).to_csv(
        in_data_root / "500unlabeled_sample.csv")

    model_id = train.main(["--epochs", "1", "--data_sample_per_epoch", "2",
                           "--batch_size", "2", "--n_last_channel", "4",
                           "--data_aug", "0"])

    data = np.load(Path(__file__).parent / "golden" / "sam_e2e.npz")
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    cfg = sam_vit_t_config()
    sam = SamModel(cfg=cfg, params=convert.sam_params_from_torch(sd, cfg))
    ckpt = in_data_root / "tiny.npz"
    modelio.save_params(ckpt, sam.params)
    emb = in_data_root / "emb.h5"
    precompute_embeddings(
        sam, [in_data_root / "img_only_front_all_left" / f"{s}.png" for s in stems],
        emb, "tiny.npz", batch_size=2, dtype=jnp.float32, progress=False)

    argv = ["--model_id", model_id, "--n_files", "500",
            "--sam_checkpoint", str(ckpt), "--sam_model_type", "vit_t",
            "--embeddings", str(emb), "--img_batch", "2"]
    save_refined_segmentations.main(argv)
    out = (in_data_root / "seg_masks" / model_id /
           "sam_box_refine_pos_points_neg_points_500.h5")
    assert out.exists()
    reader = MaskReader(out)
    assert sorted(reader.stems()) == stems
    single = {s: (reader.masks(s), reader.estimated_dice(s))
              for s in stems}
    reader.close()
    assert single[stems[0]][0].shape == (17, 384, 224)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for p in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        save_refined_segmentations.main(argv)
        assert Path(f"{out}.part{p}").exists()
    merged = merge_mask_shards(out)
    reader = MaskReader(merged)
    assert sorted(reader.stems()) == stems
    for s in stems:
        np.testing.assert_array_equal(reader.masks(s), single[s][0])
        np.testing.assert_allclose(reader.estimated_dice(s), single[s][1])
    reader.close()
