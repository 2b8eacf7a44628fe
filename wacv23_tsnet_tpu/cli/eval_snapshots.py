"""Evaluate training snapshots: reconstruction metrics over checkpoints.

The reference repo has no quantitative evaluation at all (SURVEY.md §6);
this driver turns a snapshot directory produced by `cli.train_face` into
eval-metric curves: for every checkpoint it runs whole-clip
self-reconstruction inference (sources = the first `n_source` frames of
the subject clip, driving labels = the remaining frames, ground truth =
those frames) and reports L1 / PSNR / SSIM in display space, plus a
source|target|reconstruction montage per checkpoint.

    python -m wacv23_tsnet_tpu.cli.eval_snapshots \
        --snapshot-dir runs/sustained/snapshots \
        --out-dir artifacts/round2/eval
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import re

import numpy as np

from ..configs import face_config, pose_config
from ..data.datasets import FaceDatasetTest
from ..infer.metrics import l1, psnr, ssim
from ..infer.pipeline import ClipInference, montage_row, to_display_rgb
from ..models import TSNetModules
from ..train.checkpoint import restore_checkpoint
from ..train.state import create_train_state


def display_clip(imgs_chw: np.ndarray, mean) -> np.ndarray:
    """(F, 3, H, W) model space -> (F, H, W, 3) float RGB in [0, 1]."""
    out = np.stack([to_display_rgb(f, mean) for f in imgs_chw])
    return out.astype(np.float32) / 255.0


def load_pose_self_clip(data_root: str, vdir: str, max_frames: int, mean):
    """Deterministic pose clip for self-reconstruction eval: the
    subject-clip pipeline of PoseDatasetTest (data/datasets.py) — eval
    rasterization, fixed person crop from frame 0, (128, 256) resize +
    square pad — applied to one dance video. Returns (imgs (F, 3, H, W)
    mean-subtracted BGR, class-map labels (F, H, W), bboxes (F, H, W))."""
    import random as _random

    from PIL import Image

    from ..data.codecs import image_to_labels
    from ..data.datasets import (_pad_square, _person_crop_coords,
                                 _pose_bbox_from_label, _to_bgr_mean_sub)
    from ..data.rasterize import render_openpose

    images = os.path.join(data_root, "images", vdir)
    labels = os.path.join(data_root, "labels", vdir)
    frames = sorted(os.listdir(images))[:max_frames]
    img_size = (128, 256)
    imgs, lbls, boxes = [], [], []
    coords = None
    for frame in frames:
        img = Image.open(os.path.join(images, frame))
        jpth = os.path.join(labels, frame[:-4] + "_keypoints.json")
        lbl_rgb, pose_pts, _ = render_openpose(jpth, img.size, train=False)
        if coords is None:
            coords, _ = _person_crop_coords(pose_pts, img.size, train=False,
                                            rng=_random)
        xs, ys, xe, ye = coords
        lbl = Image.fromarray(lbl_rgb[ys:ye, xs:xe])
        bbox = _pose_bbox_from_label(lbl)
        im_p = _pad_square(img.crop((xs, ys, xe, ye)).resize(img_size))
        lbl_p = _pad_square(lbl.resize(img_size, Image.NEAREST))
        bbox_p = _pad_square(bbox.resize(img_size, Image.NEAREST))
        imgs.append(_to_bgr_mean_sub(im_p, mean))
        lbls.append(image_to_labels(np.asarray(lbl_p), "pose", False, False))
        boxes.append((np.asarray(bbox_p) != 0).astype(np.uint8))
    return (np.stack(imgs), np.stack(lbls).astype(np.int32),
            np.stack(boxes))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot-dir", required=True)
    p.add_argument("--task", default="face", choices=["face", "pose"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--subject", default=None)
    p.add_argument("--n-source", type=int, default=3)
    p.add_argument("--max-frames", type=int, default=24)
    p.add_argument("--out-dir", default="eval_out")
    p.add_argument("--precision", default="high",
                   choices=["highest", "high", "default"])
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.task == "face":
        cfg = dataclasses.replace(face_config(), precision=args.precision)
        args.data_root = args.data_root or \
            "/root/reference/demo/face_examples"
        args.subject = args.subject or "val024"
    else:
        cfg = dataclasses.replace(pose_config(), precision=args.precision)
        args.data_root = args.data_root or \
            "/root/reference/demo/dance_example"
        args.subject = args.subject or "00110"
    mean = cfg.img_mean_array()

    s = args.n_source
    if args.task == "face":
        images = os.path.join(args.data_root, "images", args.subject)
        labels = os.path.join(args.data_root, "labels", args.subject)
        clip = FaceDatasetTest(images, labels, images, labels,
                               max_frame_num=args.max_frames)[0]
        src, tar = clip["src"], clip["tar"]
        src_imgs, src_lbls = src["img"][:s], src["lbl"][:s]
        src_boxes = src["bbox"][:s]
        # held-out driving frames: everything after the sources
        tar_imgs = tar["img"][s:]
        tar_lbls = tar["lbl"][s:]
        tar_boxes = tar["bbox"][s:]
    else:
        imgs, lbls, boxes = load_pose_self_clip(
            args.data_root, args.subject, args.max_frames, mean)
        src_imgs, src_lbls, src_boxes = imgs[:s], lbls[:s], boxes[:s]
        tar_imgs, tar_lbls, tar_boxes = imgs[s:], lbls[s:], boxes[s:]
    gt = display_clip(tar_imgs / 255.0, mean)

    import jax
    mods = TSNetModules(cfg)
    template = create_train_state(mods, jax.random.PRNGKey(0))

    snaps = sorted(glob.glob(os.path.join(args.snapshot_dir, "*.msgpack")))
    if not snaps:
        raise SystemExit(f"no snapshots under {args.snapshot_dir}")
    csv_path = os.path.join(args.out_dir, "eval_metrics.csv")
    engine = None
    with open(csv_path, "w") as fh:
        fh.write("step,l1,psnr,ssim\n")
        for path in snaps:
            m = re.search(r"S(\d+)", os.path.basename(path))
            step = int(m.group(1)) if m else -1
            state = restore_checkpoint(path, template)
            if engine is None:
                engine = ClipInference(cfg, state.gen_params)
            else:
                engine.params = jax.tree.map(np.asarray, state.gen_params)
            rec = engine.run(src_imgs, src_lbls, src_boxes,
                             tar_lbls, tar_boxes)
            rd = display_clip(rec, mean)
            row = (step, float(l1(rd, gt)), float(psnr(rd, gt)),
                   float(np.mean(np.asarray(ssim(rd, gt)))))
            fh.write(",".join(f"{v:.5f}" if i else str(v)
                              for i, v in enumerate(row)) + "\n")
            fh.flush()
            print(f"step {row[0]:>7}: L1 {row[1]:.4f}  PSNR {row[2]:.2f}  "
                  f"SSIM {row[3]:.4f}", flush=True)
            montage_row([
                to_display_rgb(src_imgs[0] / 255.0, mean),
                to_display_rgb(tar_imgs[0] / 255.0, mean),
                (rd[0] * 255).astype(np.uint8),
            ]).save(os.path.join(args.out_dir, f"montage_S{step:06d}.png"))
    print(f"wrote {csv_path}")


if __name__ == "__main__":
    main()
