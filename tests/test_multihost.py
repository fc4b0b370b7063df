"""Multi-host wiring (SURVEY §5 distributed backend; greenfield vs the
single-device reference): jax.distributed.initialize, per-process work
sharding, sharded dataset placement, shard merging, and a real 2-process
training step over a global mesh."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from samcarriestheburden_tpu.config import TrainConfig, UNetConfig
from samcarriestheburden_tpu.parallel import mesh as pmesh
from samcarriestheburden_tpu.parallel.distributed import process_shard
from samcarriestheburden_tpu.train.loop import UNetTrainer


def _free_port() -> str:
    """Ephemeral coordinator port: hard-coded ports collide when two test
    runs (CI jobs, xdist workers, a lingering aborted worker) share a host."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return str(s.getsockname()[1])


def test_process_shard_strided():
    items = list(range(10))
    shards = [process_shard(items, p, 3) for p in range(3)]
    assert shards[0] == [0, 3, 6, 9] and shards[1] == [1, 4, 7]
    assert sorted(sum(shards, [])) == items


class _FakeSliceDevice:
    """Stands in for a multi-slice TPU device (exposes ``slice_index``, the
    attribute real pod devices carry) so the hybrid-mesh ordering logic can
    be exercised on a CPU-only box."""

    def __init__(self, slice_index: int, id: int):
        self.slice_index = slice_index
        self.process_index = slice_index
        self.id = id
        self.platform = "cpu"
        self.device_kind = "fake-tpu"

    def __repr__(self):
        return f"fake(slice{self.slice_index}, id{self.id})"


def test_hybrid_mesh_orders_dcn_slow_varying():
    """Multi-slice branch of make_hybrid_mesh: ICI (within-slice) must be the
    fast-varying factor of the data axis so cross-slice (DCN) traffic only
    happens between large contiguous groups — and no flat-mesh fallback
    warning fires (VERDICT round 2: the branch was untested and the slice
    detection read a nonexistent attribute)."""
    import warnings

    from samcarriestheburden_tpu.parallel.distributed import make_hybrid_mesh

    devs = [_FakeSliceDevice(i // 4, i) for i in range(8)]
    # interleave so raw order != hybrid order
    shuffled = [devs[i] for i in (0, 4, 1, 5, 2, 6, 3, 7)]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = make_hybrid_mesh(devices=shuffled)
    assert not w, [str(x.message) for x in w]
    ordered = list(mesh.devices.reshape(-1))
    slices = [d.slice_index for d in ordered]
    assert slices == [0, 0, 0, 0, 1, 1, 1, 1], slices

    # single-slice devices (no slice_index attr) degenerate to the flat mesh
    flat = make_hybrid_mesh(devices=list(jax.devices()))
    assert list(flat.devices.reshape(-1)) == list(jax.devices())

    with pytest.raises(ValueError):
        make_hybrid_mesh(ici_axis_size=3, devices=shuffled)


@pytest.mark.slow
def test_sharded_data_placement_matches_replicated():
    """data_placement='sharded' partitions the dataset on the mesh yet trains
    bit-identically to the replicated path (indices/gathers are the same
    program, XLA inserts the collectives)."""
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(0)
    x = rng.random((10, 1, 32, 24)).astype(np.float32)  # 10 % 8 != 0: pad path
    y = (rng.random((10, 17, 32, 24)) > 0.7).astype(np.float32)
    ucfg = UNetConfig(n_channels=1, n_classes=17, base_channels=4,
                      n_last_channel=4)
    losses = {}
    for placement in ("replicated", "sharded"):
        cfg = TrainConfig(epochs=1, batch_size=8, data_sample_per_epoch=16,
                          data_aug=0.0, data_placement=placement,
                          epoch_scan=False)
        trainer = UNetTrainer(ucfg, cfg, mesh=mesh)
        loss, dice = trainer.train_epoch(x, y, epoch=0)
        losses[placement] = (loss, dice)
    np.testing.assert_allclose(losses["sharded"][0], losses["replicated"][0],
                               rtol=1e-6)
    np.testing.assert_allclose(losses["sharded"][1], losses["replicated"][1],
                               rtol=1e-5)


def test_merge_embedding_shards(tmp_path):
    from samcarriestheburden_tpu.data.h5io import EmbeddingReader, EmbeddingWriter
    from samcarriestheburden_tpu.engine.embeddings import merge_embedding_shards

    out = tmp_path / "emb.h5"
    feats = {f"im{i}": np.full((1, 4, 2, 2), i, np.float32) for i in range(5)}
    for p in range(2):
        with EmbeddingWriter(f"{out}.part{p}", "ckpt.npz", 128) as w:
            for i, (stem, f) in enumerate(feats.items()):
                if i % 2 == p:
                    w.write(stem, f, (20, 30), (10, 15))
    merged = merge_embedding_shards(out, delete_parts=True)
    reader = EmbeddingReader(merged)
    assert sorted(reader.stems()) == sorted(feats)
    for stem, f in feats.items():
        np.testing.assert_array_equal(reader.features(stem), f)
    assert not Path(f"{out}.part0").exists()


@pytest.mark.slow
def test_two_process_training_step():
    """Real 2-process run: jax.distributed.initialize over localhost, global
    4-device mesh (2 local CPU devices per process), one U-Net training epoch
    with both dataset placements — losses agree across processes and with a
    single-process 4-device run."""
    worker = Path(__file__).parent / "mh_worker.py"
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(p), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**__import__("os").environ,
             "PYTHONPATH": str(Path(__file__).parent.parent)})
        for p in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, placement, loss = line.split()
                results[(pid, placement)] = float(loss)
    assert len(results) == 4, f"missing results: {results}"
    for placement in ("replicated", "sharded"):
        a, b = results[("p0", placement)], results[("p1", placement)]
        assert a == b, f"{placement}: cross-process loss mismatch {a} vs {b}"

    # single-process 4-device reference (same data/seed/mesh size)
    mesh = pmesh.make_mesh(4)
    rng = np.random.default_rng(0)
    x = rng.random((8, 1, 32, 24)).astype(np.float32)
    y = (rng.random((8, 17, 32, 24)) > 0.7).astype(np.float32)
    cfg = TrainConfig(epochs=1, batch_size=4, data_sample_per_epoch=8,
                      data_aug=0.0, epoch_scan=False)
    trainer = UNetTrainer(UNetConfig(n_channels=1, n_classes=17,
                                     base_channels=4, n_last_channel=4),
                          cfg, mesh=mesh)
    loss, _ = trainer.train_epoch(x, y, epoch=0)
    np.testing.assert_allclose(results[("p0", "replicated")], loss, rtol=1e-6)


@pytest.mark.slow
def test_two_process_cli_scaleout(data_root, monkeypatch):
    """REAL 2-process scale-out of the three production inference CLIs
    (VERDICT r3 #2/#6 — the monkeypatched equivalence test in test_cli.py
    simulates process_count; this one spawns genuine jax.distributed gloo
    processes): ``generate_img_embeddings`` (via its own --multihost flag
    path + --merge_shards), ``save_refined_segmentations`` (mask shard
    parts), and ``amg`` (strided per-image outputs).  Every artifact of the
    2-process run must be bit-identical to a genuine single-process run of
    the same worker script."""
    import shutil
    import subprocess
    import sys
    from pathlib import Path

    import pandas as pd

    from samcarriestheburden_tpu.cli import train
    from samcarriestheburden_tpu.data.h5io import (EmbeddingReader, MaskReader,
                                                   merge_mask_shards)
    from samcarriestheburden_tpu.models import convert, modelio
    from samcarriestheburden_tpu.models.sam import SamModel

    monkeypatch.chdir(data_root.parent)
    pd.DataFrame({"filestem": ["img002", "img003", "img005"]}).to_csv(
        data_root / "500unlabeled_sample.csv")

    model_id = train.main(["--epochs", "1", "--data_sample_per_epoch", "2",
                           "--batch_size", "2", "--n_last_channel", "4",
                           "--data_aug", "0"])

    # tiny golden-seeded SAM checkpoint (same weights for every process)
    from samcarriestheburden_tpu.config import sam_vit_t_config

    gold = np.load(Path(__file__).parent / "golden" / "sam_e2e.npz")
    sd = {k[3:]: gold[k] for k in gold.files if k.startswith("sd/")}
    cfg = sam_vit_t_config()
    sam = SamModel(cfg=cfg, params=convert.sam_params_from_torch(sd, cfg))
    modelio.save_params(data_root / "tiny.npz", sam.params)

    amg_in = data_root / "amg_in"
    amg_in.mkdir()
    for s in ("img000", "img001"):
        shutil.copy(data_root / "img_only_front_all_left" / f"{s}.png",
                    amg_in / f"{s}.png")

    worker = Path(__file__).parent / "mh_cli_worker.py"
    env = {**__import__("os").environ,
           "PYTHONPATH": str(Path(__file__).parent.parent)}

    port = _free_port()

    def spawn(pid, nproc, tag):
        return subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(nproc), port,
             str(data_root.parent), model_id, tag],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)

    procs = [spawn(0, 1, "single"), spawn(0, 2, "mh"), spawn(1, 2, "mh")]
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        assert "RESULT" in out

    # embeddings: CLI-merged 2-process shards == single-process file
    r1 = EmbeddingReader(data_root / "emb_single.h5")
    r2 = EmbeddingReader(data_root / "emb_mh.h5")
    assert sorted(r1.stems()) == sorted(r2.stems()) and len(r1.stems()) == 6
    for s in r1.stems():
        np.testing.assert_array_equal(r1.features(s), r2.features(s))

    # refined sweep: merged mask shards == single-process h5
    out = (data_root / "seg_masks" / model_id /
           "sam_box_refine_pos_points_neg_points_500.h5")
    reader = MaskReader(out)
    single = {s: (reader.masks(s), reader.estimated_dice(s))
              for s in reader.stems()}
    reader.close()
    assert sorted(single) == ["img002", "img003", "img005"]
    out.unlink()
    merged = MaskReader(merge_mask_shards(out, n_processes=2))
    assert sorted(merged.stems()) == sorted(single)
    for s, (m, est) in single.items():
        np.testing.assert_array_equal(merged.masks(s), m)
        np.testing.assert_allclose(merged.estimated_dice(s), est)
    merged.close()

    # AMG: per-image outputs byte-identical between the two runs
    for img_dir in sorted((data_root.parent / "out_amg_single").iterdir()):
        mh_dir = data_root.parent / "out_amg_mh" / img_dir.name
        names = sorted(f.name for f in img_dir.iterdir())
        assert names == sorted(f.name for f in mh_dir.iterdir()) and names
        for f in names:
            assert (img_dir / f).read_bytes() == (mh_dir / f).read_bytes(), \
                f"{img_dir.name}/{f} differs between 1- and 2-process runs"


def test_merge_mask_shards(tmp_path):
    from samcarriestheburden_tpu.data.h5io import (MaskReader, MaskWriter,
                                                   merge_mask_shards)

    out = tmp_path / "masks.h5"
    masks = {f"im{i}": np.full((3, 4, 5), i, np.uint8) for i in range(5)}
    for p in range(2):
        with MaskWriter(f"{out}.part{p}",
                        attrs={"model_id": "m0"}) as w:
            for i, (stem, m) in enumerate(masks.items()):
                if i % 2 == p:
                    w.write(stem, m, estimated_dice=np.full(3, i / 10.0))
    merged = merge_mask_shards(out, delete_parts=True)
    reader = MaskReader(merged)
    assert sorted(reader.stems()) == sorted(masks)
    assert reader.f.attrs["model_id"] == "m0"
    for i, (stem, m) in enumerate(masks.items()):
        np.testing.assert_array_equal(reader.masks(stem), m)
        np.testing.assert_allclose(reader.estimated_dice(stem),
                                   np.full(3, i / 10.0))
    reader.close()
    assert not Path(f"{out}.part0").exists()


def test_merge_mask_shards_rejects_stale_parts(tmp_path):
    """Auto-globbed shards must form a contiguous 0..N-1 index range — a
    leftover .part file from an earlier higher-process-count run fails loudly
    instead of being silently merged as stale data (round-3 ADVICE)."""
    import pytest

    from samcarriestheburden_tpu.data.h5io import MaskWriter, merge_mask_shards

    out = tmp_path / "masks.h5"
    for p in (0, 1, 3):  # part2 missing -> part3 must be stale
        with MaskWriter(f"{out}.part{p}", attrs={"model_id": "m0"}) as w:
            w.write(f"im{p}", np.zeros((3, 4, 5), np.uint8))
    with pytest.raises(ValueError, match="not contiguous"):
        merge_mask_shards(out)
    # explicit n_processes overrides the glob and ignores the stale extra
    merged = merge_mask_shards(out, n_processes=2)
    assert merged.exists()


def test_merge_shards_rejects_wrong_shard_count_provenance(tmp_path):
    """Contiguity alone can't catch CONTIGUOUS stale leftovers (a 2-process
    run overwriting part0/part1 of an earlier 4-process run) — the
    write-time shard_count attr can (round-4 review finding)."""
    import pytest

    from samcarriestheburden_tpu.data.h5io import (EmbeddingWriter,
                                                   MaskWriter,
                                                   merge_mask_shards)
    from samcarriestheburden_tpu.engine.embeddings import \
        merge_embedding_shards

    out = tmp_path / "masks.h5"
    for p, claimed in ((0, 2), (1, 2), (2, 4), (3, 4)):  # part2/3 stale
        with MaskWriter(f"{out}.part{p}", attrs={"model_id": "m0",
                                                 "shard_count": claimed}) as w:
            w.write(f"im{p}", np.zeros((3, 4, 5), np.uint8))
    with pytest.raises(ValueError, match="stale"):
        merge_mask_shards(out)
    with pytest.raises(ValueError, match="stale"):
        merge_mask_shards(out, n_processes=4)  # explicit count checks too
    # the two fresh shards alone merge fine — and the merged single file
    # must NOT inherit part-0's shard_count (it is no longer a shard)
    Path(f"{out}.part2").unlink()
    Path(f"{out}.part3").unlink()
    merged = merge_mask_shards(out)
    assert merged.exists()
    import h5py
    with h5py.File(merged, "r") as f:
        assert "shard_count" not in f.attrs
        assert f.attrs["model_id"] == "m0"  # other attrs still copied

    # same guard on the embeddings merger
    emb = tmp_path / "emb.h5"
    for p, claimed in ((0, 1), (1, 3)):
        with EmbeddingWriter(f"{emb}.part{p}", "ckpt.npz", 128) as w:
            w.f.attrs["shard_count"] = claimed
            w.write(f"im{p}", np.zeros((1, 4, 2, 2), np.float32),
                    (20, 30), (10, 15))
    with pytest.raises(ValueError, match="stale"):
        merge_embedding_shards(emb)
