import numpy as np
import pytest
import torch
import torch.nn.functional as F

from samcarriestheburden_tpu.config import TrainConfig, UNetConfig
from samcarriestheburden_tpu.train.augment import affine_grid, grid_sample
from samcarriestheburden_tpu.train.logging import RunLogger
from samcarriestheburden_tpu.train.loop import (
    UNetTrainer, bce_with_logits, cosine_lr, train_unet)


def test_affine_grid_matches_torch(rng):
    theta = (np.eye(2, 3)[None] + rng.standard_normal((4, 2, 3)) * 0.05).astype(np.float32)
    ours = np.asarray(affine_grid(theta, (13, 9)))
    theirs = F.affine_grid(torch.from_numpy(theta), (4, 1, 13, 9),
                           align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, mode):
    x = rng.standard_normal((2, 3, 16, 12)).astype(np.float32)
    theta = (np.eye(2, 3)[None] + rng.standard_normal((2, 2, 3)) * 0.1).astype(np.float32)
    grid_t = F.affine_grid(torch.from_numpy(theta), (2, 3, 16, 12), align_corners=False)
    ours = np.asarray(grid_sample(x, np.asarray(grid_t.numpy()), mode))
    theirs = F.grid_sample(torch.from_numpy(x), grid_t, mode=mode,
                           align_corners=False).numpy()
    if mode == "nearest":
        # rounding of exact .5 coordinates may differ (banker's vs away);
        # require near-total agreement
        assert (np.isclose(ours, theirs, atol=1e-6)).mean() > 0.99
    else:
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_matmul_matches_gather(rng):
    """The gather-free MXU warp formulation must reproduce the 4-tap path."""
    from samcarriestheburden_tpu.train.augment import (
        grid_sample_matmul)

    x = rng.standard_normal((3, 2, 37, 29)).astype(np.float32)
    theta = (np.eye(2, 3)[None]
             + rng.standard_normal((3, 2, 3)) * 0.1).astype(np.float32)
    grid = affine_grid(theta, (37, 29))
    for mode in ("bilinear", "nearest"):
        ours = np.asarray(grid_sample_matmul(x, grid, mode, row_block=8))
        ref = np.asarray(grid_sample(x, np.asarray(grid), mode))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_matmul_matches_torch(rng):
    from samcarriestheburden_tpu.train.augment import grid_sample_matmul

    x = rng.standard_normal((2, 3, 16, 12)).astype(np.float32)
    theta = (np.eye(2, 3)[None]
             + rng.standard_normal((2, 2, 3)) * 0.1).astype(np.float32)
    grid_t = F.affine_grid(torch.from_numpy(theta), (2, 3, 16, 12),
                           align_corners=False)
    ours = np.asarray(grid_sample_matmul(x, np.asarray(grid_t.numpy()),
                                         "bilinear", row_block=4))
    theirs = F.grid_sample(torch.from_numpy(x), grid_t, mode="bilinear",
                           align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_warp_affine_matmul_bitpacking_exact(rng):
    """Binary multilabel masks warped via the packed-bitfield nearest path
    must match the per-channel gather warp EXACTLY (δ-matmuls copy values)."""
    from samcarriestheburden_tpu.train.augment import warp_affine

    x = rng.standard_normal((4, 1, 48, 40)).astype(np.float32)
    y = (rng.random((4, 17, 48, 40)) > 0.6).astype(np.float32)
    theta = (np.eye(2, 3)[None]
             + rng.standard_normal((4, 2, 3)) * 0.08).astype(np.float32)
    xm, ym = warp_affine(x, y, theta, method="matmul")
    xg, yg = warp_affine(x, y, theta, method="gather")
    np.testing.assert_array_equal(np.asarray(ym), np.asarray(yg))
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xg), atol=1e-5)


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    targets = (rng.random((2, 3, 8, 8)) > 0.5).astype(np.float32)
    w = np.asarray([1.0, 5.0, 0.5], np.float32)
    ours = float(bce_with_logits(logits, targets, w.reshape(-1, 1, 1)))
    theirs = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        pos_weight=torch.from_numpy(w).view(-1, 1, 1)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_cosine_lr_matches_torch_schedule():
    lr0, epochs = 1e-3, 350
    eta_min = lr0 / 100
    for epoch in [0, 1, 100, 349, 350]:
        ours = float(cosine_lr(np.float32(epoch), lr0, epochs, eta_min))
        theirs = eta_min + (lr0 - eta_min) * (1 + np.cos(np.pi * epoch / epochs)) / 2
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def _toy_data(rng, n=8, c=3, hw=(32, 32)):
    x = rng.random((n, 1, *hw)).astype(np.float32)
    y = np.zeros((n, c, *hw), np.float32)
    for i in range(n):
        # mask depends on the image so the task is learnable
        y[i, i % c] = (x[i, 0] > 0.5).astype(np.float32)
    return x, y


def test_training_loss_decreases(rng):
    x, y = _toy_data(rng)
    cfg = TrainConfig(epochs=8, batch_size=4, data_sample_per_epoch=8,
                      data_aug=0.0, lr=3e-3)
    ucfg = UNetConfig(n_channels=1, n_classes=3, base_channels=4, n_last_channel=4)
    params, history = train_unet((x, y), (x, y), ucfg, cfg)
    assert history[-1]["val_bce"] < history[0]["val_bce"]
    assert np.isfinite(history[-1]["val_dice"])


def test_training_with_augmentation_runs(rng):
    x, y = _toy_data(rng, n=4)
    cfg = TrainConfig(epochs=2, batch_size=4, data_sample_per_epoch=4, data_aug=0.03)
    ucfg = UNetConfig(n_channels=1, n_classes=3, base_channels=4, n_last_channel=4)
    params, history = train_unet((x, y), (x, y), ucfg, cfg)
    assert len(history) == 2 and np.isfinite(history[-1]["train_bce"])


def test_data_parallel_training(rng):
    """Batch sharded over the 8-device CPU mesh; grads psum'd by XLA."""
    from samcarriestheburden_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(8)
    x, y = _toy_data(rng, n=16)
    cfg = TrainConfig(epochs=2, batch_size=16, data_sample_per_epoch=16, data_aug=0.0)
    ucfg = UNetConfig(n_channels=1, n_classes=3, base_channels=4, n_last_channel=4)
    params, history = train_unet((x, y), (x, y), ucfg, cfg, mesh=mesh)
    assert np.isfinite(history[-1]["val_bce"])


def test_logger(tmp_path):
    log = RunLogger("proj", "task", tags=["a"], root=tmp_path)
    log.report_scalar("BCE", "train", 0.5, 0)
    log.report_scalar("BCE", "train", 0.4, 1)
    log.report_histogram("Dice", "val", 0, [0.1, float("nan")], xlabels=["a", "b"])
    recs = log.scalars()
    assert len(recs) == 2 and recs[1]["value"] == 0.4
    log.close()


def test_checkpoint_resume(rng, tmp_path):
    """Interrupted training resumes exactly from the saved epoch."""
    x, y = _toy_data(rng, n=4)
    ucfg = UNetConfig(n_channels=1, n_classes=3, base_channels=4, n_last_channel=4)

    cfg_full = TrainConfig(epochs=4, batch_size=4, data_sample_per_epoch=4,
                           data_aug=0.0)
    params_full, hist_full = train_unet((x, y), (x, y), ucfg, cfg_full)

    ck = tmp_path / "ckpt"
    train_unet((x, y), (x, y), ucfg, cfg_full, checkpoint_dir=ck,
               checkpoint_every=2)
    # simulate a crash after epoch 2: drop the final checkpoint and resume
    import shutil
    shutil.rmtree(ck / "epoch_00004")
    params_res, hist_res = train_unet((x, y), (x, y), ucfg, cfg_full,
                                      checkpoint_dir=ck, checkpoint_every=2)
    assert [h["epoch"] for h in hist_res] == [2, 3]
    import jax
    for a, b in zip(jax.tree.leaves(params_full), jax.tree.leaves(params_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_profiling_phase_timer(tmp_path):
    from samcarriestheburden_tpu.profiling import PhaseTimer

    t = PhaseTimer(sync=False)
    with t.phase("encode"):
        pass
    with t.phase("encode"):
        pass
    with t.phase("decode"):
        pass
    rep = t.report()
    assert rep["encode"]["count"] == 2 and rep["decode"]["count"] == 1
    t.dump(tmp_path / "p.json")
    assert (tmp_path / "p.json").exists()


def test_bf16_training(rng):
    x, y = _toy_data(rng, n=4)
    cfg = TrainConfig(epochs=3, batch_size=4, data_sample_per_epoch=4,
                      data_aug=0.0, lr=3e-3, compute_dtype="bfloat16")
    ucfg = UNetConfig(n_channels=1, n_classes=3, base_channels=4, n_last_channel=4)
    params, history = train_unet((x, y), (x, y), ucfg, cfg)
    assert np.isfinite(history[-1]["val_bce"])
    assert history[-1]["train_bce"] < history[0]["train_bce"]
    import jax
    assert all(a.dtype == np.float32 for a in jax.tree.leaves(params)
               if hasattr(a, "dtype"))


def test_epoch_scan_matches_per_step(rng):
    """The scan-epoch path must produce the same params as per-step training."""
    x, y = _toy_data(rng, n=4)
    ucfg = UNetConfig(n_channels=1, n_classes=3, base_channels=4, n_last_channel=4)
    out = {}
    for scan in [False, True]:
        cfg = TrainConfig(epochs=2, batch_size=2, data_sample_per_epoch=4,
                          data_aug=0.03, epoch_scan=scan)
        params, hist = train_unet((x, y), (x, y), ucfg, cfg)
        out[scan] = (params, hist)
    import jax
    for a, b in zip(jax.tree.leaves(out[False][0]), jax.tree.leaves(out[True][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(out[False][1][-1]["train_bce"],
                               out[True][1][-1]["train_bce"], rtol=1e-4)
