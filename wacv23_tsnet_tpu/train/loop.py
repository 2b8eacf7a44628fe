"""The shared GAN training loop (reference train_face.py:221-380).

Clip semantics preserved exactly: each loaded batch is a (B, T)-frame
clip; the first `n_source` frames are the shared sources and frames
n_source..T-1 are successive targets, giving T - n_source optimizer
steps per clip. The poly LR advances per optimizer step scaled by batch
size (examples seen), and checkpoints/image snapshots fire on the same
counters as the reference.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import TrainConfig, TSNetConfig
from ..data.codecs import labels_to_onehot
from ..infer.pipeline import montage_row, to_display_rgb
from ..models.api import TSNet, _nhwc
from ..utils import AverageMeter, StepTimer
from .checkpoint import save_checkpoint


def run_training(model: TSNet, loader, cfg: TSNetConfig, tcfg: TrainConfig,
                 final_step: int, start_step: int = 0,
                 snapshot_dir: str = "snapshots",
                 imgshot_dir: str = "imgshots",
                 save_every: int = 1000,
                 n_source: int = 3) -> int:
    os.makedirs(snapshot_dir, exist_ok=True)
    os.makedirs(imgshot_dir, exist_ok=True)
    meters = {name: AverageMeter() for name in model.loss_names}
    timer = StepTimer()
    mean = cfg.img_mean_array()
    actual_step = start_step
    t0 = time.time()

    while actual_step < final_step:
        for clip in loader:
            timer.mark_data()
            imgs = clip["img"]           # (B, T, 3, H, W) dataset space
            lbls = clip["lbl"]           # (B, T, H, W)
            boxes = clip["bbox"]         # (B, T, H, W)
            bsz, n_total = imgs.shape[:2]

            # Stage the clip's shared sources on device ONCE; only the
            # small per-target tensors transfer inside the frame loop
            # (the reference re-stages sources every step,
            # train_face.py:250 / TSNet.py:266-281).
            src_dev = {
                "src_img": jax.device_put(np.stack(
                    [_nhwc(imgs[:, i] / 255.0) for i in range(n_source)],
                    axis=1)),
                "src_lbl": jax.device_put(np.stack(
                    [_nhwc(labels_to_onehot(lbls[:, i], cfg.task))
                     for i in range(n_source)], axis=1)),
                "src_bbox": jax.device_put(
                    boxes[:, :n_source].astype(np.float32)),
            }

            for frame_iter in range(n_source, n_total):
                if actual_step >= final_step:
                    break
                model.setup(actual_step, tcfg.batch_size, tcfg.initial_iter,
                            tcfg.max_iter, tcfg.power)
                step_batch = dict(src_dev)
                step_batch["tar_img"] = jnp.asarray(
                    _nhwc(imgs[:, frame_iter] / 255.0))
                step_batch["tar_lbl"] = jnp.asarray(
                    _nhwc(labels_to_onehot(lbls[:, frame_iter], cfg.task)))
                step_batch["tar_bbox"] = jnp.asarray(
                    boxes[:, frame_iter].astype(np.float32))
                model.optimize_parameters_on(step_batch)
                actual_step += 1

                for name, value in model.get_current_losses().items():
                    meters[name].update(value, bsz)

                if actual_step % tcfg.print_freq == 0:
                    losses = " ".join(
                        f"{k}={m.avg:.3f}" for k, m in meters.items())
                    print(f"step {actual_step}/{final_step} "
                          f"({time.time() - t0:.0f}s) {losses}")
                    model.print_learning_rate()

                if actual_step % tcfg.save_img_freq == 0:
                    _save_imgshot(model, imgs, lbls, frame_iter, mean,
                                  imgshot_dir, actual_step, cfg)

                if actual_step % save_every == 0:
                    path = os.path.join(
                        snapshot_dir, f"TSNet_S{actual_step:06d}.msgpack")
                    save_checkpoint(path, model.state)
                    print(f"saved snapshot {path}")
            timer.mark_batch()
            if actual_step >= final_step:
                break

    path = os.path.join(snapshot_dir, f"TSNet_S{actual_step:06d}.msgpack")
    save_checkpoint(path, model.state)
    print(f"final snapshot {path}; "
          f"avg batch {timer.batch.avg:.3f}s data {timer.data.avg:.3f}s")
    return actual_step


def _save_imgshot(model, imgs, lbls, frame_iter, mean, imgshot_dir,
                  step, cfg):
    """source | target | reconstruction [| warp] montage.

    `imgs` are dataset-space (mean-subtracted, 0..255 scale), so they
    divide by 255 before `to_display_rgb` (which expects model space);
    `rec_tar_img` is already model space.
    """
    from ..data.codecs import labels_to_image

    row = [
        to_display_rgb(imgs[0, 0] / 255.0, mean),
        labels_to_image(lbls[0, frame_iter], cfg.task)
        if cfg.task == "pose" else
        np.repeat(labels_to_image(lbls[0, frame_iter], "face")[..., None],
                  3, axis=-1),
        to_display_rgb(imgs[0, frame_iter] / 255.0, mean),
        to_display_rgb(model.rec_tar_img[0], mean),
    ]
    if model.warp_src_img_list:
        row.append(to_display_rgb(model.warp_src_img_list[0][0], mean))
    montage_row(row).save(
        os.path.join(imgshot_dir, f"step_{step:06d}.png"))
