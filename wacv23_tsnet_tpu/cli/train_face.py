"""Train TS-Net on FaceForensics-style data (reference train_face.py).

    python -m wacv23_tsnet_tpu.cli.train_face \
        --label-path <keypoints_dir> --image-path <frames_dir> \
        --root-dir runs/face

All reference knobs are exposed; defaults match train_face.py:22-54.
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys

import numpy as np

from ..configs import TrainConfig, face_config
from ..data.datasets import FaceDatasetTrain
from ..data.loader import Loader
from ..models.api import TSNet
from ..train.checkpoint import restore_checkpoint
from ..train.loop import run_training
from ..utils import Logger


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--label-path", required=True)
    p.add_argument("--image-path", required=True)
    p.add_argument("--root-dir", default="runs/face")
    p.add_argument("--batch-size", type=int, default=15)
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--n-source", type=int, default=3)
    p.add_argument("--n-frame-total", type=int, default=10)
    p.add_argument("--n-blocks", type=int, default=4)
    p.add_argument("--n-downsampling", type=int, default=3)
    p.add_argument("--initial-epoch", type=int, default=400)
    p.add_argument("--max-epoch", type=int, default=900)
    p.add_argument("--num-videos", type=int, default=150)
    p.add_argument("--lambda-dec", type=float, default=1.0)
    p.add_argument("--no-jitter", action="store_true")
    p.add_argument("--no-mirror", action="store_true")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="MXU precision (highest = torch bit-parity)")
    p.add_argument("--bwd-precision", default=None,
                   choices=["highest", "high", "default"],
                   help="MXU precision of the backward convs only "
                        "(default: same as --precision; 'default' = one "
                        "bf16 pass, see ops/dpconv.py)")
    p.add_argument("--fast-tail", action="store_true",
                   help="run the decoder + FuseNet in bf16/default-MXU "
                        "(the inference fast tier) during training too; "
                        "encoders, similarity branch, warp supervision "
                        "and losses stay f32 (see configs/base.py)")
    p.add_argument("--random-seed", type=int, default=1234)
    p.add_argument("--restore-from", default="")
    p.add_argument("--set-start", action="store_true")
    p.add_argument("--start-step", type=int, default=0)
    p.add_argument("--final-step", type=int, default=None)
    p.add_argument("--print-freq", type=int, default=100)
    p.add_argument("--save-pred-every", type=int, default=None)
    p.add_argument("--lambda-vgg", type=float, default=None,
                   help="override the VGG perceptual weight (e.g. 0 to "
                        "ablate — used to bound the random-VGG impact)")
    args = p.parse_args(argv)

    random.seed(args.random_seed)
    np.random.seed(args.random_seed)

    import dataclasses
    overrides = {}
    if args.lambda_vgg is not None:
        overrides["lambda_vgg"] = args.lambda_vgg
    cfg = dataclasses.replace(face_config(), n_source=args.n_source,
                              dec_n_blocks=args.n_blocks,
                              n_downsampling=args.n_downsampling,
                              precision=args.precision,
                              bwd_precision=args.bwd_precision,
                              fast_tail=args.fast_tail,
                              **overrides)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.learning_rate,
                       lambda_dec=args.lambda_dec,
                       initial_epoch=args.initial_epoch,
                       max_epoch=args.max_epoch,
                       n_frame_total=args.n_frame_total,
                       n_source=args.n_source,
                       num_videos=args.num_videos,
                       seed=args.random_seed,
                       print_freq=args.print_freq)

    snapshot_dir = os.path.join(args.root_dir, "snapshots")
    os.makedirs(snapshot_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(
        snapshot_dir, f"B{args.batch_size:04d}E{args.max_epoch:04d}.log"))

    steps_per_epoch = math.ceil(tcfg.num_examples_per_epoch
                                / float(args.batch_size))
    final_step = args.final_step or steps_per_epoch * args.max_epoch
    save_every = args.save_pred_every or max(
        1, steps_per_epoch * (args.max_epoch // 10))

    model = TSNet(cfg, lr=args.learning_rate, is_train=True,
                  lambda_dec=args.lambda_dec, seed=args.random_seed)
    start_step = args.start_step
    if args.restore_from and os.path.isfile(args.restore_from):
        model.state = restore_checkpoint(args.restore_from, model.state)
        if args.set_start:
            start_step = int(model.state.step)
        print(f"=> restored {args.restore_from} at step {start_step}")

    dataset = FaceDatasetTrain(
        label_path=args.label_path, image_path=args.image_path,
        mean=cfg.img_mean_array(), n_frame_total=args.n_frame_total,
        is_jitter=not args.no_jitter, is_mirror=not args.no_mirror,
        rng=random.Random(args.random_seed))
    loader = Loader(dataset, batch_size=args.batch_size, shuffle=True,
                    num_workers=args.num_workers, seed=args.random_seed)

    run_training(model, loader, cfg, tcfg, final_step=final_step,
                 start_step=start_step, snapshot_dir=snapshot_dir,
                 imgshot_dir=os.path.join(args.root_dir, "imgshots"),
                 save_every=save_every, n_source=args.n_source,
                 history_path=os.path.join(args.root_dir, "history.csv"))


if __name__ == "__main__":
    main()
