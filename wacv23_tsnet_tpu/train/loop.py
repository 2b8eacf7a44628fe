"""The shared GAN training loop (reference train_face.py:221-380).

Clip semantics preserved exactly: each loaded batch is a (B, T)-frame
clip; the first `n_source` frames are the shared sources and frames
n_source..T-1 are successive targets, giving T - n_source optimizer
steps per clip. The poly LR advances per optimizer step scaled by batch
size (examples seen), and checkpoints/image snapshots fire on the same
counters as the reference.

Feeding is transfer-minimal (host->device bandwidth is the scarce
resource on tunneled TPU hosts):
- tensors cross as COMPACT uint8 (raw BGR pixels, label class maps, 0/1
  bboxes) and a jitted expander performs mean-subtract + /255 + one-hot
  on device (~8x fewer bytes than staging the float batch);
- the clip's sources transfer once, not once per target step;
- per-step metrics stay on device and sync in one stacked transfer at
  print/snapshot boundaries, so step dispatch pipelines with host prep.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import TrainConfig, TSNetConfig
from ..infer.pipeline import montage_row, to_display_rgb
from ..models.api import TSNet
from ..utils import AverageMeter, StepTimer
from .checkpoint import save_checkpoint


def _make_expanders(label_nc: int, mean: np.ndarray):
    """Jitted uint8 -> model-space expanders (run on device)."""
    mean_dev = jnp.asarray(mean, jnp.float32)

    @jax.jit
    def expand_sources(img_u8, lbl_u8, bbox_u8):
        # img_u8 (B, S, H, W, 3) raw BGR -> (BGR - mean)/255 model space
        img = (img_u8.astype(jnp.float32) - mean_dev) / 255.0
        lbl = jax.nn.one_hot(lbl_u8, label_nc, dtype=jnp.float32)
        return img, lbl, bbox_u8.astype(jnp.float32)

    @jax.jit
    def expand_target(img_u8, lbl_u8, bbox_u8):
        img = (img_u8.astype(jnp.float32) - mean_dev) / 255.0
        lbl = jax.nn.one_hot(lbl_u8, label_nc, dtype=jnp.float32)
        return img, lbl, bbox_u8.astype(jnp.float32)

    return expand_sources, expand_target


def _nhwc_u8(imgs_ds: np.ndarray, mean: np.ndarray) -> np.ndarray:
    """Dataset-space (C-first, BGR - mean) floats -> raw uint8 NHWC."""
    raw = imgs_ds.transpose(0, 2, 3, 1) + mean
    return np.clip(np.rint(raw), 0, 255).astype(np.uint8)


def run_training(model: TSNet, loader, cfg: TSNetConfig, tcfg: TrainConfig,
                 final_step: int, start_step: int = 0,
                 snapshot_dir: str = "snapshots",
                 imgshot_dir: str = "imgshots",
                 save_every: int = 1000,
                 n_source: int = 3,
                 history_path: str | None = None) -> int:
    """Drive the GAN training loop; mirrors reference train_face.py:221-380.

    `history_path`, when given, appends one CSV row of running-average
    losses per `print_freq` steps — the loss-curve artifact for
    monitoring sustained runs.
    """
    os.makedirs(snapshot_dir, exist_ok=True)
    os.makedirs(imgshot_dir, exist_ok=True)
    meters = {name: AverageMeter() for name in model.loss_names}
    timer = StepTimer()
    mean = cfg.img_mean_array()
    expand_sources, expand_target = _make_expanders(cfg.label_nc, mean)
    actual_step = start_step
    t0 = time.time()
    pending: list = []   # (device metrics dict, batch size) per step

    def sync_pending():
        if not pending:
            return
        stacked = np.asarray(jnp.stack(
            [jnp.stack(list(m.values())) for m, _ in pending]))
        keys = list(pending[0][0])
        for row, (_, bsz) in zip(stacked, pending):
            for k, v in zip(keys, row):
                meters[k].update(float(v), bsz)
                model._losses[k] = float(v)
        pending.clear()

    while actual_step < final_step:
        for clip in loader:
            timer.mark_data()
            imgs = clip["img"]           # (B, T, 3, H, W) dataset space
            lbls = clip["lbl"]           # (B, T, H, W) class maps
            boxes = clip["bbox"]         # (B, T, H, W) 0/1
            bsz, n_total = imgs.shape[:2]

            src_u8 = np.stack([_nhwc_u8(imgs[:, i], mean)
                               for i in range(n_source)], axis=1)
            src_img, src_lbl, src_bbox = expand_sources(
                jnp.asarray(src_u8),
                jnp.asarray(lbls[:, :n_source].astype(np.uint8)),
                jnp.asarray(boxes[:, :n_source].astype(np.uint8)))
            src_dev = {"src_img": src_img, "src_lbl": src_lbl,
                       "src_bbox": src_bbox}

            for frame_iter in range(n_source, n_total):
                if actual_step >= final_step:
                    break
                model.setup(actual_step, tcfg.batch_size, tcfg.initial_iter,
                            tcfg.max_iter, tcfg.power)
                tar_img, tar_lbl, tar_bbox = expand_target(
                    jnp.asarray(_nhwc_u8(imgs[:, frame_iter], mean)),
                    jnp.asarray(lbls[:, frame_iter].astype(np.uint8)),
                    jnp.asarray(boxes[:, frame_iter].astype(np.uint8)))
                step_batch = dict(src_dev)
                step_batch.update(tar_img=tar_img, tar_lbl=tar_lbl,
                                  tar_bbox=tar_bbox)
                model.optimize_parameters_on(step_batch)
                pending.append((model._metrics_dev, bsz))
                model._metrics_dev = None   # loop owns the sync
                actual_step += 1

                if actual_step % tcfg.print_freq == 0:
                    sync_pending()
                    losses = " ".join(
                        f"{k}={m.avg:.3f}" for k, m in meters.items())
                    print(f"step {actual_step}/{final_step} "
                          f"({time.time() - t0:.0f}s) {losses}")
                    model.print_learning_rate()
                    if history_path is not None:
                        header = not os.path.exists(history_path)
                        with open(history_path, "a") as fh:
                            if header:
                                fh.write("step,seconds," + ",".join(
                                    meters) + "\n")
                            fh.write(f"{actual_step},"
                                     f"{time.time() - t0:.1f},"
                                     + ",".join(f"{m.avg:.5f}"
                                                for m in meters.values())
                                     + "\n")

                if actual_step % tcfg.save_img_freq == 0:
                    sync_pending()
                    _save_imgshot(model, imgs, lbls, frame_iter, mean,
                                  imgshot_dir, actual_step, cfg,
                                  step_batch)

                if actual_step % save_every == 0:
                    sync_pending()
                    path = os.path.join(
                        snapshot_dir, f"TSNet_S{actual_step:06d}.msgpack")
                    save_checkpoint(path, model.state)
                    print(f"saved snapshot {path}")
            timer.mark_batch()
            if actual_step >= final_step:
                break

    sync_pending()
    path = os.path.join(snapshot_dir, f"TSNet_S{actual_step:06d}.msgpack")
    save_checkpoint(path, model.state)
    print(f"final snapshot {path}; "
          f"avg batch {timer.batch.avg:.3f}s data {timer.data.avg:.3f}s")
    return actual_step


def _save_imgshot(model, imgs, lbls, frame_iter, mean, imgshot_dir,
                  step, cfg, step_batch=None):
    """source | target | reconstruction | warp montage.

    `imgs` are dataset-space (mean-subtracted, 0..255 scale), so they
    divide by 255 before `to_display_rgb` (which expects model space);
    `rec_tar_img` and the warp previews are already model space.
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
    if step_batch is not None:
        warp = model.render_warp_previews(step_batch)
        row.append(to_display_rgb(warp[0, 0], mean))
    elif model.warp_src_img_list:
        row.append(to_display_rgb(model.warp_src_img_list[0][0], mean))
    montage_row(row).save(
        os.path.join(imgshot_dir, f"step_{step:06d}.png"))
