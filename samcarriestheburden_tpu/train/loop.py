"""U-Net training loops (reference unet_training/{forward_func,training,
training_on_pseudo_labels}.py).

Reference semantics preserved: bootstrap sampling with replacement
(training.py:41-42), per-class pos-weighted BCE-with-logits
(forward_func.py:44-46), random affine augmentation fused into the jitted
train step, AdamW + per-epoch cosine annealing to lr/100 (training.py:55-56),
per-epoch train/val BCE + NaN-aware Dice scalars and per-class histograms.

TPU-native: one jitted train step (normalise → augment → forward → loss →
grad → update) per batch shape; batches are sharded over the mesh's 'data'
axis and XLA inserts the gradient psum."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from samcarriestheburden_tpu.config import (
    GRAZ_IMG_MEAN, GRAZ_IMG_STD, POS_CLASS_WEIGHT, TrainConfig, UNetConfig)
from samcarriestheburden_tpu.models import unet
from samcarriestheburden_tpu.ops.dice import multilabel_dice
from samcarriestheburden_tpu.parallel import mesh as pmesh
from samcarriestheburden_tpu.parallel.distributed import host_value
from samcarriestheburden_tpu.train.augment import random_affine


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: jnp.ndarray) -> jnp.ndarray:
    """torch BCEWithLogitsLoss(pos_weight=w) — mean of
    w·y·softplus(−x) + (1−y)·(x + softplus(−x)), numerically stable."""
    sp = jax.nn.softplus(-logits)
    loss = pos_weight * targets * sp + (1 - targets) * (logits + sp)
    return jnp.mean(loss)


def cosine_lr(epoch: jnp.ndarray, base_lr: float, epochs: int,
              eta_min: float) -> jnp.ndarray:
    """torch CosineAnnealingLR stepped per epoch (training.py:56)."""
    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * epoch / epochs)) / 2


@dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    epoch: int = 0


class UNetTrainer:
    def __init__(self, unet_cfg: UNetConfig, train_cfg: TrainConfig,
                 init_params: Optional[dict] = None, mesh=None):
        self.unet_cfg = unet_cfg
        self.cfg = train_cfg
        self.mesh = mesh
        key = jax.random.PRNGKey(train_cfg.seed)
        params = init_params if init_params is not None \
            else unet.init(key, unet_cfg)
        if mesh is not None:
            params = pmesh.replicate(mesh, params)

        eta_min = train_cfg.lr / 100
        self.optimizer = optax.inject_hyperparams(optax.adamw)(
            learning_rate=train_cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=train_cfg.weight_decay)
        self.state = TrainState(params=params,
                                opt_state=self.optimizer.init(params))
        self._eta_min = eta_min
        nclass = unet_cfg.n_classes
        w = np.asarray(POS_CLASS_WEIGHT[:nclass], np.float32) \
            if nclass <= len(POS_CLASS_WEIGHT) else np.ones(nclass, np.float32)
        self.pos_weight = jnp.asarray(w).reshape(-1, 1, 1)

        self._train_step = jax.jit(self._train_step_impl)
        self._train_epoch_scan = jax.jit(self._train_epoch_scan_impl)
        self._gather_augment = jax.jit(self._gather_augment_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------

    @property
    def _aug_method(self) -> str:
        """'matmul' (gather-free MXU warp) on TPU, reference 4-tap 'gather'
        elsewhere — unless forced via cfg.aug_method."""
        if self.cfg.aug_method is not None:
            return self.cfg.aug_method
        return "matmul" if jax.default_backend() == "tpu" else "gather"

    def _augment(self, x, y, key, data_aug):
        """Normalise + (optionally) warp — outside the grad closure, like the
        reference's no_grad augmentation block (forward_func.py:34-42); the
        warp has no autodiff rule and needs none."""
        x = (x - GRAZ_IMG_MEAN) / GRAZ_IMG_STD
        if data_aug > 0:
            x, y = random_affine(key, x, y, data_aug, method=self._aug_method)
        return x, y

    def _forward_loss(self, params, x, y, w):
        """``w`` (B,) marks real vs padded samples (mesh-divisibility padding);
        the weighted mean equals torch's all-element mean on real data."""
        if self.cfg.compute_dtype == "bfloat16":
            # mixed precision: bf16 forward, fp32 master params/loss/optimizer
            p16 = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            logits = unet.apply(p16, self.unet_cfg,
                                x.astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            logits = unet.apply(params, self.unet_cfg, x)
        sp = jax.nn.softplus(-logits)
        per_elem = self.pos_weight * y * sp + (1 - y) * (logits + sp)
        per_sample = jnp.mean(per_elem, axis=(1, 2, 3))
        loss = jnp.sum(per_sample * w) / jnp.sum(w)
        return loss, (logits, y)

    def _train_step_impl(self, params, opt_state, x_all, y_all, idx, w, key, lr):
        x = x_all[idx]
        y = y_all[idx].astype(jnp.float32)
        x, y = self._augment(x, y, key, self.cfg.data_aug)
        (loss, (logits, y_aug)), grads = jax.value_and_grad(
            self._forward_loss, has_aux=True)(params, x, y, w)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        dice = multilabel_dice(jax.nn.sigmoid(logits) > 0.5, y_aug > 0.5)
        return params, opt_state, loss, dice

    def _gather_augment_impl(self, x_all, y_all, idx, keys):
        """Gather + normalise + warp one whole epoch (idx: (S, B); keys: (S, 2)).
        Runs as its own jit so an accelerator warp kernel never sits inside
        the epoch scan (jax-0.9 trips a lowering-cache KeyError on
        scan+pallas+grad); the warp maps over steps so per-block weight
        matrices stay batch-sized regardless of epoch length."""
        x = x_all[idx]                               # (S, B, 1, H, W)
        y = y_all[idx].astype(jnp.float32)
        x = (x - GRAZ_IMG_MEAN) / GRAZ_IMG_STD
        if self.cfg.data_aug > 0:
            method = self._aug_method

            def one_step(args):
                xs_, ys_, key = args
                # per-step key chain identical to the per-step path
                return random_affine(key, xs_, ys_, self.cfg.data_aug,
                                     method=method)

            x, y = jax.lax.map(one_step, (x, y, keys))
        return x, y

    def _train_epoch_scan_impl(self, params, opt_state, xs, ys, w, lr):
        """Whole epoch as one lax.scan over pre-augmented steps
        (xs/ys: (S, B, ...), w: (S, B)).  One dispatch + one host sync per
        EPOCH instead of per step — per-step latency through the remote tunnel
        was ~6x the 110 ms step compute."""

        def step(carry, inp):
            params, opt_state = carry
            x, y, w_b = inp
            (loss, (logits, y_aug)), grads = jax.value_and_grad(
                self._forward_loss, has_aux=True)(params, x, y, w_b)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            dice = multilabel_dice(jax.nn.sigmoid(logits) > 0.5, y_aug > 0.5)
            return (params, opt_state), (loss, dice)

        (params, opt_state), (losses, dices) = jax.lax.scan(
            step, (params, opt_state), (xs, ys, w))
        return params, opt_state, losses, dices

    def _eval_step_impl(self, params, x_all, y_all, idx, w):
        x = x_all[idx]
        y = y_all[idx].astype(jnp.float32)
        x = (x - GRAZ_IMG_MEAN) / GRAZ_IMG_STD
        loss, (logits, y_out) = self._forward_loss(params, x, y, w)
        dice = multilabel_dice(jax.nn.sigmoid(logits) > 0.5, y_out > 0.5)
        return loss, dice

    # ------------------------------------------------------------------

    # ------------------------------------------------------------------
    # device-resident dataset: the GrazPedWri splits are tiny (64 labelled /
    # 500 pseudo-labelled images), so the whole split is transferred once
    # (labels as uint8, 4x smaller) and every step gathers its batch ON
    # DEVICE from host-sampled indices.  Per-step host->device transfers of
    # (B, 17, 384, 224) float labels cost ~seconds through a remote tunnel.
    # ------------------------------------------------------------------

    def _device_data(self, x, y):
        key = (id(x), id(y), x.shape, y.shape)
        if getattr(self, "_data_cache_key", None) != key:
            xh = np.asarray(x, np.float32)
            yh = np.asarray(y).astype(np.uint8)
            if self.mesh is not None and self.cfg.data_placement == "sharded":
                # partition the dataset itself on the data axis (scales past
                # per-device HBM); per-step index gathers become XLA
                # cross-device collectives.  Pad to mesh divisibility — the
                # sampler never emits indices >= len(x).
                n_dev = self.mesh.devices.size
                xh, _ = pmesh.pad_to_multiple(xh, n_dev)
                yh, _ = pmesh.pad_to_multiple(yh, n_dev)
                xd, yd = pmesh.shard_batch(self.mesh, (jnp.asarray(xh),
                                                       jnp.asarray(yh)))
            elif self.mesh is not None:
                xd, yd = pmesh.replicate(self.mesh, (jnp.asarray(xh),
                                                     jnp.asarray(yh)))
            else:
                xd, yd = jnp.asarray(xh), jnp.asarray(yh)
            self._data_cache = (xd, yd)
            self._data_cache_key = key
        return self._data_cache

    def _batch_indices(self, n_total, order, batch_size):
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        for i in range(0, len(order), batch_size):
            idx = order[i:i + batch_size]
            idx, n_valid = pmesh.pad_to_multiple(np.asarray(idx, np.int32), n_dev)
            w = (np.arange(len(idx)) < n_valid).astype(np.float32)
            if self.mesh is not None:
                idx, w = pmesh.shard_batch(
                    self.mesh, (jnp.asarray(idx), jnp.asarray(w)))
            yield jnp.asarray(idx), jnp.asarray(w), int(n_valid)

    def train_epoch(self, x: np.ndarray, y: np.ndarray, epoch: int,
                    rng: np.random.Generator = None) -> Tuple[float, np.ndarray]:
        """One epoch: bootstrap-sample ``data_sample_per_epoch`` items with
        replacement (reference RandomSampler(replacement=True), training.py:41-42).

        Sampling is keyed on (seed, epoch) — not a sequential stream — so a
        run resumed from a checkpoint replays the identical epoch schedule."""
        cfg = self.cfg
        rng = np.random.default_rng((cfg.seed, epoch))
        if cfg.sample_mode == "bootstrap":
            order = rng.integers(0, len(x), cfg.data_sample_per_epoch)
        else:  # shuffled full epoch, drop_last (pseudo-label training)
            order = rng.permutation(len(x))
            order = order[: (len(order) // cfg.batch_size) * cfg.batch_size]
        lr = cosine_lr(jnp.asarray(epoch, jnp.float32), cfg.lr, cfg.epochs,
                       self._eta_min) if cfg.lr_scheduler else jnp.asarray(cfg.lr)
        xd, yd = self._device_data(x, y)
        batches = list(self._batch_indices(len(x), order, cfg.batch_size))
        use_scan = cfg.epoch_scan if cfg.epoch_scan is not None \
            else jax.default_backend() == "tpu"
        # identical per-step key chain in both paths (scan == per-step exactly)
        key = jax.random.PRNGKey(cfg.seed * 100003 + epoch)
        subs = []
        for _ in batches:
            key, sub = jax.random.split(key)
            subs.append(sub)
        if use_scan:
            idx = jnp.stack([b[0] for b in batches])      # (S, B)
            w = jnp.stack([b[1] for b in batches])        # (S, B)
            keys = jnp.stack(subs)
            xs, ys = self._gather_augment(xd, yd, idx, keys)
            self.state.params, self.state.opt_state, losses, dices = \
                self._train_epoch_scan(self.state.params, self.state.opt_state,
                                       xs, ys, w, lr)
            losses = host_value(losses)
            dices = host_value(dices)
            dice_rows = [dices[s, :b[2]] for s, b in enumerate(batches)]
        else:
            losses, dice_rows = [], []
            for (idx, w, n_valid), sub in zip(batches, subs):
                self.state.params, self.state.opt_state, loss, dice = \
                    self._train_step(self.state.params, self.state.opt_state,
                                     xd, yd, idx, w, sub, lr)
                losses.append(float(host_value(loss)))
                dice_rows.append(host_value(dice)[:n_valid])
        self.state.epoch = epoch + 1
        return float(np.mean(losses)), np.concatenate(dice_rows)

    def evaluate(self, x: np.ndarray, y: np.ndarray) -> Tuple[float, np.ndarray]:
        xd, yd = self._device_data(x, y)
        order = np.arange(len(x))
        losses, dices = [], []
        for idx, w, n_valid in self._batch_indices(len(x), order,
                                                   self.cfg.infer_batch_size):
            loss, dice = self._eval_step(self.state.params, xd, yd, idx, w)
            losses.append(float(host_value(loss)))
            dices.append(host_value(dice)[:n_valid])
        return float(np.mean(losses)), np.concatenate(dices)

    @property
    def current_lr(self) -> float:
        e = self.state.epoch
        if not self.cfg.lr_scheduler:
            return self.cfg.lr
        return float(cosine_lr(jnp.asarray(e, jnp.float32), self.cfg.lr,
                               self.cfg.epochs, self._eta_min))


def train_unet(train_data, val_data, unet_cfg: UNetConfig, train_cfg: TrainConfig,
               logger=None, bone_labels=None, init_params=None, mesh=None,
               progress: bool = False, checkpoint_dir=None,
               checkpoint_every: int = 50, timer=None) -> Tuple[dict, List[Dict]]:
    """Full training driver (reference training.py:64-72).

    train_data/val_data: (images (N,1,H,W) f32 in [0,1], masks (N,C,H,W) f32).
    ``checkpoint_dir`` enables periodic Orbax checkpoints + exact resume
    (absent in the reference, SURVEY §5).  ``timer`` (an optional
    profiling.PhaseTimer) accounts train/eval phases.  Returns
    (params, history).
    """
    if timer is None:
        from samcarriestheburden_tpu.profiling import PhaseTimer

        timer = PhaseTimer(sync=False)  # no-op accounting
    trainer = UNetTrainer(unet_cfg, train_cfg, init_params=init_params, mesh=mesh)
    start_epoch = 0
    if checkpoint_dir is not None:
        from samcarriestheburden_tpu.train import checkpoint as ckpt

        latest = ckpt.latest_checkpoint(checkpoint_dir)
        if latest is not None:
            trainer.state.params, trainer.state.opt_state, start_epoch = \
                ckpt.restore_train_state(latest, trainer.state.params,
                                         trainer.state.opt_state)
            trainer.state.epoch = start_epoch
    x_tr, y_tr = train_data
    x_va, y_va = val_data
    history = []
    epochs = range(start_epoch, train_cfg.epochs)
    if progress:
        from tqdm import tqdm
        epochs = tqdm(epochs, desc="training", total=train_cfg.epochs,
                      initial=start_epoch)
    for epoch in epochs:
        with timer.phase("train_epoch"):
            tr_loss, tr_dice = trainer.train_epoch(x_tr, y_tr, epoch)
        with timer.phase("evaluate"):
            va_loss, va_dice = trainer.evaluate(x_va, y_va)
        rec = {"epoch": epoch, "train_bce": tr_loss,
               "train_dice": float(np.nanmean(tr_dice)),
               "val_bce": va_loss, "val_dice": float(np.nanmean(va_dice)),
               "lr": trainer.current_lr}
        history.append(rec)
        if logger is not None:
            logger.report_scalar("BCE", "train", tr_loss, epoch)
            logger.report_scalar("Dice", "train", rec["train_dice"], epoch)
            logger.report_scalar("BCE", "val", va_loss, epoch)
            logger.report_scalar("Dice", "val", rec["val_dice"], epoch)
            if train_cfg.lr_scheduler:
                logger.report_scalar("Learning rate", "lr", rec["lr"], epoch)
            logger.report_histogram("Dice", "val", epoch,
                                    np.nanmean(va_dice, axis=0),
                                    xlabels=bone_labels, xaxis="class",
                                    yaxis="dice")
        if checkpoint_dir is not None and (
                (epoch + 1) % checkpoint_every == 0
                or epoch + 1 == train_cfg.epochs):
            from samcarriestheburden_tpu.train import checkpoint as ckpt

            ckpt.save_train_state(checkpoint_dir, epoch + 1,
                                  trainer.state.params, trainer.state.opt_state)
    return trainer.state.params, history
