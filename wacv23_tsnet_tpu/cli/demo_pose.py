"""Dance retargeting demo (reference demo/demo_pose.py equivalent).

Runs the pose-variant TS-Net on a subject/driving pair from the bundled
dance example, with pose-normalizing keypoint retargeting for
cross-gender pairs, writing montage frames + a GIF.

    python -m wacv23_tsnet_tpu.cli.demo_pose \
        --data-root /root/reference/demo/dance_example \
        --json-root /root/reference/dataset/json_pose \
        --pair "110 164" --restore-from ckpt.msgpack
"""

from __future__ import annotations

import argparse
import os
import random
import time

import numpy as np

from ..configs import pose_config
from ..data.codecs import labels_to_image
from ..data.datasets import IMG_MEAN, PoseDatasetTest
from ..infer import ClipInference, montage_row, save_gif, to_display_rgb
from .demo_face import load_params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default="/root/reference/demo/dance_example")
    p.add_argument("--json-root", default="/root/reference/dataset/json_pose")
    p.add_argument("--pair", default="110 164")
    p.add_argument("--restore-from", default="")
    p.add_argument("--out-dir", default="demo_pose_out")
    p.add_argument("--n-source", type=int, default=3)
    p.add_argument("--max-frames", type=int, default=30)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--precision", default="high",
                   choices=["highest", "high", "default"],
                   help="MXU precision (high: 1.2e-3 L1 drift, 1.6x faster)")
    p.add_argument("--fast-trunk", action="store_true",
                   help="encoders at 1-pass bf16 MXU (3.1e-4 display drift; artifacts/round5/pose_fast_trunk_drift.json)")
    p.add_argument("--fast-tail", action="store_true",
                   help="bf16 fuse+decoder tail (extra speed, small drift)")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    random.seed(args.seed)
    import dataclasses
    cfg = dataclasses.replace(pose_config(), precision=args.precision,
                              fast_tail=args.fast_tail,
                              fast_trunk=args.fast_trunk)
    params = load_params(args.restore_from, cfg)

    dataset = PoseDatasetTest(
        test_pairs=[args.pair],
        sub_json_path=os.path.join(args.json_root, "clean_video_dict.json"),
        msk_json_path=os.path.join(args.json_root,
                                   "clean_unseen_video_dict.json"),
        label_path=os.path.join(args.data_root, "labels"),
        smooth_label_path=os.path.join(args.json_root, "smooth_openpose"),
        image_path=os.path.join(args.data_root, "images"),
        n_frame_total=args.max_frames,
    )
    sample = dataset[0]
    src, tar = sample["src"], sample["tar"]
    print(f"gender pair: '{sample['diff_sex'] or 'same'}'")
    ref_idx = random.sample(range(src["img"].shape[0]), args.n_source)

    engine = ClipInference(cfg, params, chunk=args.chunk)
    t0 = time.time()
    rec = engine.run_renormalized(
        src["img"][ref_idx],
        src["lbl"][ref_idx], src["bbox"][ref_idx],
        tar["lbl"], tar["bbox"])
    dt = time.time() - t0
    n_frames = rec.shape[0]
    print(f"The total test time is {dt:.3f}s "
          f"({n_frames / dt:.2f} frames/sec)")

    os.makedirs(args.out_dir, exist_ok=True)
    frames = []
    for i in range(n_frames):
        row = montage_row([
            to_display_rgb(src["img"][min(i, src["img"].shape[0] - 1)]
                           / 255.0, IMG_MEAN),
            labels_to_image(tar["lbl"][i], "pose"),
            to_display_rgb(tar["img"][i] / 255.0, IMG_MEAN),
            to_display_rgb(rec[i], IMG_MEAN),
        ])
        row.save(os.path.join(args.out_dir, f"{i:06d}_{tar['names'][i]}.png"))
        frames.append(np.asarray(row))
    save_gif(os.path.join(args.out_dir,
                          args.pair.replace(" ", "_") + ".gif"), frames)
    print(f"wrote {n_frames} montages + GIF to {args.out_dir}")


if __name__ == "__main__":
    main()
