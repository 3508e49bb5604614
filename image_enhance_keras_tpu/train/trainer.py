"""Jitted trainer — the learn.py capability, done consistently.

Behaviour contract kept from the reference (models.py:131-157, 1203-1213):
Adam(1e-4, beta1=0.9), MSE on [0,1] floats, per-epoch validation with
best-checkpoint selection, history persisted per epoch
(advanced.py HistoryCheckpoint).  Superseded parts: the train step is one
XLA program (degrade + forward + loss + grads + update fused on device), data
is sampled on the fly (no materialised patch dirs), checkpoints carry
optimizer state (true resume), and the step runs data-parallel over a mesh
when one is provided (net-new vs the single-GPU reference, SURVEY.md 2.9).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from image_enhance_keras_tpu.models import get_model, init_params
from image_enhance_keras_tpu.data.pipeline import (
    PatchSampler,
    degrade_batch_on_device,
    synthetic_images,
)
from image_enhance_keras_tpu.train.checkpoints import CheckpointManager
from image_enhance_keras_tpu.train.callbacks import HistoryLogger
from image_enhance_keras_tpu.utils.config import Config
from image_enhance_keras_tpu.utils.logging import get_logger

__all__ = ["TrainState", "Trainer", "make_train_step"]

log = get_logger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int
    #: EMA shadow of ``params`` (None when disabled).  Last child so the
    #: leading leaves stay the raw params — engine.load_weights and old
    #: checkpoints (which have no ema leaves) keep working unchanged.
    ema: Any = None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step, s.ema), None),
    lambda _, c: TrainState(*c),
)


def pixel_loss_fn(kind: str, eps: float = 1e-3) -> Callable:
    """Pixel loss by name: "mse" (reference contract, models.py:1203-1213),
    "charbonnier" (sqrt(d^2+eps^2), the LapSRN/EDSR-family robust loss) or
    "l1".  All reduce with a mean over the batch."""
    if kind == "mse":
        return lambda pred, y: jnp.mean((pred - y) ** 2)
    if kind == "charbonnier":
        e2 = float(eps) ** 2
        return lambda pred, y: jnp.mean(jnp.sqrt((pred - y) ** 2 + e2))
    if kind == "l1":
        return lambda pred, y: jnp.mean(jnp.abs(pred - y))
    raise ValueError(f"unknown loss {kind!r}: expected mse|charbonnier|l1")


def mask_frozen(tx, module):
    """Wrap ``tx`` so the module's ``frozen_params`` collections (the
    reference's trainable=False entry conv, models.py:1305) receive exactly
    zero updates.  Shared by the Trainer and the engine's per-image
    internal-learning adaptation (ADVICE r4: the latter used to train the
    frozen entry conv)."""
    frozen = tuple(getattr(module, "frozen_params", ()) or ())
    if not frozen:
        return tx

    def labels(params):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "freeze" if k in frozen else "train", v
            )
            for k, v in params.items()
        }

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def make_train_step(
    module, tx, scale: int, blur_sigma: float, pre_upscale: bool = False,
    ema_decay: float = 0.0, loss: str = "mse", charbonnier_eps: float = 1e-3,
) -> Callable:
    """Build the fused degrade->forward->loss->update step (one XLA program).

    ``pre_upscale``: difvdsr-family models refine a bicubic-upscaled input
    (models.py:652) — upscale LR back to HR size before the net.
    ``ema_decay``: when > 0, also advance the EMA shadow params inside the
    same program (state.ema must be initialised by the caller).
    ``loss``: pixel loss (see pixel_loss_fn); the reported "psnr" metric is
    always computed from the MSE so runs stay comparable across losses.
    """
    objective = pixel_loss_fn(loss, charbonnier_eps)

    def net_input(lr_x):
        if pre_upscale:
            from image_enhance_keras_tpu.ops.resize import resize_bicubic_pil

            return resize_bicubic_pil(
                lr_x, (lr_x.shape[-3] * scale, lr_x.shape[-2] * scale)
            )
        return lr_x

    def loss_fn(params, lr_x, hr_y):
        pred = module.apply({"params": params}, net_input(lr_x))
        return objective(pred, hr_y), pred

    def step(state: TrainState, hr_u8: jnp.ndarray):
        lr_x = degrade_batch_on_device(hr_u8, scale=scale, blur_sigma=blur_sigma)
        hr_y = hr_u8.astype(jnp.float32) / 255.0
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lr_x, hr_y
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema_decay > 0.0 and ema is not None:
            d = jnp.float32(ema_decay)
            ema = jax.tree_util.tree_map(
                lambda e, p: (d * e + (1.0 - d) * p.astype(e.dtype)), ema, params
            )
        psnr = -10.0 * jnp.log10(jnp.mean((pred - hr_y) ** 2))
        return TrainState(params, opt_state, state.step + 1, ema), {
            "loss": loss,
            "psnr": psnr,
        }

    return step


def make_eval_step(module, scale: int, blur_sigma: float, pre_upscale: bool = False) -> Callable:
    def step(params, hr_u8):
        lr_x = degrade_batch_on_device(hr_u8, scale=scale, blur_sigma=blur_sigma)
        hr_y = hr_u8.astype(jnp.float32) / 255.0
        if pre_upscale:
            from image_enhance_keras_tpu.ops.resize import resize_bicubic_pil

            lr_x = resize_bicubic_pil(
                lr_x, (lr_x.shape[-3] * scale, lr_x.shape[-2] * scale)
            )
        pred = module.apply({"params": params}, lr_x)
        mse = jnp.mean((pred - hr_y) ** 2)
        return {"val_loss": mse, "val_psnr": -10.0 * jnp.log10(mse)}

    return step


def make_image_metric_step(module, scale: int, pre_upscale: bool = False) -> Callable:
    """Full-image eval under the *scoring* protocol (scorpath.py): PIL-bicubic
    degrade (no blur — models.py:1545-1560), whole-frame forward, 10-px crop,
    Y-channel PSNR/SSIM.  This is the metric the project is gated on, so the
    trainer can select best checkpoints by it (monitor='val_ssim_y') instead
    of patch-level val_psnr on the (different) training degradation.
    """
    from image_enhance_keras_tpu.ops.resize import resize_pil_uint8
    from image_enhance_keras_tpu.ops.color import rgb2ycbcr
    from image_enhance_keras_tpu.ops.metrics import psnr_nitre, ssim

    def step(params, gt_u8):
        h, w = gt_u8.shape[0], gt_u8.shape[1]
        lr = resize_pil_uint8(gt_u8, (h // scale, w // scale))
        if pre_upscale:
            lr = resize_pil_uint8(lr, (h, w))
        sr = module.apply({"params": params}, lr[None] / 255.0)[0]
        sr = jnp.clip(jnp.round(sr * 255.0), 0.0, 255.0)
        gt = gt_u8.astype(jnp.float32)[10:-10, 10:-10]
        sr = sr[10:-10, 10:-10]
        gt_y = rgb2ycbcr(gt)[..., 0]
        sr_y = rgb2ycbcr(sr)[..., 0]
        return {
            "val_psnr_y": psnr_nitre(sr_y, gt_y, 0),
            "val_ssim_y": ssim(sr_y, gt_y, data_range=255.0),
        }

    return step


class Trainer:
    """Single-chip or data-parallel trainer for any zoo model."""

    def __init__(
        self,
        config: Config | None = None,
        train_images: list[np.ndarray] | None = None,
        val_images: list[np.ndarray] | None = None,
        mesh=None,
        train_weights: list[float] | None = None,
    ):
        from image_enhance_keras_tpu.utils.jax_setup import setup_jax

        setup_jax()
        self.config = config or Config()
        cfg = self.config
        self.module, self.spec = get_model(
            cfg.model, dtype=cfg.jax_dtype(), **(cfg.model_kwargs or {})
        )
        pre_up = self.spec.pre_upscaled_input
        # training degradation factor: the network's own scale, or (for
        # pre-upscaled-input refiners whose net_scale is 1) the reference's
        # x4 serving degradation (models.py:652, scalemulti).  r2 VERDICT
        # next-10: the trainer used to hard-code x4 and raise otherwise.
        scale = cfg.scalemulti if pre_up else self.spec.net_scale
        self.train_scale = scale

        if train_images is None:
            log.warning("no training images provided; using synthetic smoke set")
            train_images = synthetic_images(8, max(128, cfg.lr_patch * scale + 8))
        if val_images is None:
            val_images = train_images[:2]

        hr_patch = cfg.lr_patch * scale
        # multi-host: each process samples ITS shard of the global batch
        # (distinct seed per host); _global_batch assembles the global array
        # from the per-process shards (parallel/distributed.py bootstrap).
        proc = jax.process_index() if jax.process_count() > 1 else 0
        self.sampler = PatchSampler(
            train_images,
            hr_patch=hr_patch,
            batch_size=cfg.batch_size,
            seed=cfg.seed + 7919 * proc,
            augment=cfg.augment,
            weights=train_weights,
            moa=cfg.moa,
        )
        self.val_sampler = PatchSampler(
            val_images, hr_patch=hr_patch, batch_size=cfg.batch_size,
            seed=cfg.seed + 1 + 7919 * proc,
        )

        if cfg.lr_schedule == "cosine":
            lr = optax.cosine_decay_schedule(
                cfg.lr, decay_steps=max(cfg.epochs * cfg.steps_per_epoch, 1),
                alpha=0.05,
            )
        else:
            lr = cfg.lr
        tx = optax.adam(lr, b1=cfg.beta1)
        if cfg.clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
        # reference trainable=False on the entry conv (models.py:1305):
        # route frozen top-level collections to set_to_zero so their
        # update is exactly 0 (optax.masked would pass raw grads through)
        tx = mask_frozen(tx, self.module)
        self.tx = tx
        params = init_params(
            self.module, jax.random.PRNGKey(cfg.seed), input_hw=(cfg.lr_patch, cfg.lr_patch)
        )
        ema = (
            jax.tree_util.tree_map(jnp.asarray, params)
            if cfg.ema_decay > 0.0
            else None
        )
        self.state = TrainState(params, self.tx.init(params), 0, ema)

        self.mesh = mesh
        step = make_train_step(
            self.module, self.tx, scale, cfg.blur_sigma, pre_up,
            ema_decay=cfg.ema_decay, loss=cfg.loss,
            charbonnier_eps=cfg.charbonnier_eps,
        )
        eval_step = make_eval_step(self.module, scale, cfg.blur_sigma, pre_up)
        if mesh is not None:
            from image_enhance_keras_tpu.parallel.data_parallel import (
                shard_train_step,
                shard_eval_step,
            )

            self.train_step = shard_train_step(step, mesh)
            self.eval_step = shard_eval_step(eval_step, mesh)
            self.state = jax.device_put(
                self.state,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            )
        else:
            self.train_step = jax.jit(step)
            self.eval_step = jax.jit(eval_step)

        # full-image metric gate (the scorpath protocol the project is
        # judged on) — evaluated per epoch on the full val frames, cropped
        # to a multiple of the scale so LR*scale == GT
        monitor = cfg.monitor
        self._image_metric_step = None
        self._image_metric_fn = None  # jit caches per input shape itself
        self.metric_images: list[np.ndarray] = []
        if monitor in ("val_ssim_y", "val_psnr_y") or cfg.image_eval:
            self._image_metric_step = make_image_metric_step(
                self.module, scale, pre_up
            )
            for im in val_images:
                h = (im.shape[0] // scale) * scale
                w = (im.shape[1] // scale) * scale
                if h >= 44 and w >= 44:  # crop-10 must leave pixels
                    self.metric_images.append(np.asarray(im[:h, :w]))
            if not self.metric_images and monitor in ("val_ssim_y", "val_psnr_y"):
                log.warning(
                    "monitor=%s but no val image is >=44px after /4 crop; "
                    "falling back to val_psnr", monitor,
                )
                monitor = "val_psnr"
        # loss-like monitors minimise; everything else (psnr/ssim) maximises
        mode = "min" if monitor.endswith("loss") else "max"
        self.ckpt = CheckpointManager(cfg.checkpoint_dir, monitor=monitor, mode=mode)
        self.history = HistoryLogger(f"{cfg.checkpoint_dir}/history.json")

    def _eval_params(self):
        """Params the val metrics / best-checkpoint gate score: the EMA
        shadow when enabled (those are the weights that would be served),
        else the raw optimiser params."""
        return self.state.ema if self.state.ema is not None else self.state.params

    def _global_batch(self, batch_np: np.ndarray) -> jnp.ndarray:
        """Host batch -> device array for the train/eval step.

        Single process: a plain transfer (the jit's in_shardings place it).
        Multi-host: this process's sample is one shard of the global batch
        along the data axis — assemble the global array without any
        cross-host data movement (global batch = local batch x n_processes;
        gradients still all-reduce over ICI/DCN inside the step)."""
        if self.mesh is None or jax.process_count() == 1:
            return jnp.asarray(batch_np)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        return jax.make_array_from_process_local_data(sharding, batch_np)

    def _image_metrics(self) -> dict[str, float]:
        if self._image_metric_step is None or not self.metric_images:
            return {}
        if self._image_metric_fn is None:
            self._image_metric_fn = jax.jit(self._image_metric_step)
        vals = [
            self._image_metric_fn(self._eval_params(), jnp.asarray(im))
            for im in self.metric_images
        ]
        return {
            k: float(np.mean([float(v[k]) for v in vals])) for k in vals[0]
        }

    # ------------------------------------------------------------------
    def resume(self) -> bool:
        restored = self.ckpt.restore_latest(like=self.state)
        if restored is None:
            return False
        self.state = restored
        log.info("resumed from step %s", int(self.state.step))
        return True

    def fit(
        self,
        epochs: int | None = None,
        steps_per_epoch: int | None = None,
        val_steps: int = 4,
    ) -> dict:
        cfg = self.config
        epochs = epochs or cfg.epochs
        steps_per_epoch = steps_per_epoch or cfg.steps_per_epoch
        if cfg.lr_schedule == "cosine" and epochs * steps_per_epoch != max(
            cfg.epochs * cfg.steps_per_epoch, 1
        ):
            log.warning(
                "cosine schedule was built for %d total steps but fit() will "
                "run %d — later steps train at the decayed floor (rebuild the "
                "Trainer with matching epochs/steps_per_epoch to re-span it)",
                max(cfg.epochs * cfg.steps_per_epoch, 1), epochs * steps_per_epoch,
            )
        # a resumed state continues the epoch numbering (resume() restored
        # step): restarting at 1 would duplicate history/index epoch labels
        start_epoch = int(self.state.step) // max(steps_per_epoch, 1)
        if start_epoch >= epochs:
            log.info("resume: %d epochs already trained (budget %d) — nothing to do",
                     start_epoch, epochs)
            return self.history.as_dict()
        for epoch in range(start_epoch + 1, epochs + 1):
            t0 = time.time()
            losses, psnrs = [], []
            for _ in range(steps_per_epoch):
                batch = self._global_batch(self.sampler.sample())
                self.state, metrics = self.train_step(self.state, batch)
                losses.append(metrics["loss"])
                psnrs.append(metrics["psnr"])
            val = {}
            vals = [
                self.eval_step(
                    self._eval_params(), self._global_batch(self.val_sampler.sample())
                )
                for _ in range(val_steps)
            ]
            val = {
                k: float(np.mean([float(v[k]) for v in vals])) for k in vals[0]
            }
            val.update(self._image_metrics())
            epoch_metrics = {
                "loss": float(np.mean([float(x) for x in losses])),
                "psnr": float(np.mean([float(x) for x in psnrs])),
                **val,
                "sec": time.time() - t0,
            }
            # checkpoint cadence: every cfg.ckpt_every epochs + final epoch
            # (saves pull ~18MB off-device; cadence matters on slow links)
            is_best = False
            if epoch % max(cfg.ckpt_every, 1) == 0 or epoch == epochs:
                is_best = self.ckpt.save_epoch(self.state, epoch, epoch_metrics)
                if self.state.ema is not None:
                    # serving artifact for the EMA weights the gate scored
                    # (engine.load_weights on the orbax dir yields the RAW
                    # params — the npz is the explicit EMA distribution)
                    from image_enhance_keras_tpu.train.checkpoints import (
                        export_params_npz,
                    )

                    export_params_npz(
                        f"{cfg.checkpoint_dir}/latest_ema.npz", self.state.ema
                    )
                    if is_best:
                        export_params_npz(
                            f"{cfg.checkpoint_dir}/best_ema.npz", self.state.ema
                        )
            self.history.log_epoch(epoch, epoch_metrics)
            log.info(
                "epoch %d/%d loss %.5f psnr %.2f val_psnr %.2f (%.1fs)%s",
                epoch, epochs, epoch_metrics["loss"], epoch_metrics["psnr"],
                epoch_metrics.get("val_psnr", float("nan")), epoch_metrics["sec"],
                " *best*" if is_best else "",
            )
        return self.history.as_dict()
