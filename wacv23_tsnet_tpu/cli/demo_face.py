"""Face reenactment demo (reference demo/demo_face.py equivalent).

Runs pretrained TS-Net over a subject clip + driving clip pair from the
bundled face examples, writing source|driving|reconstruction montages
and a GIF. Unlike the reference's per-frame Python loop, the whole
driving clip runs as chunked jitted inference with sources encoded once.

    python -m wacv23_tsnet_tpu.cli.demo_face \
        --data-root /root/reference/demo/face_examples \
        --subject val024 --driving test114 \
        --restore-from ckpt.msgpack --out-dir /tmp/demo_face
"""

from __future__ import annotations

import argparse
import os
import random
import time

import numpy as np

from ..configs import face_config
from ..data.datasets import FaceDatasetTest, IMG_MEAN
from ..infer import ClipInference, montage_row, save_gif, to_display_rgb
from ..models import TSNetModules


def load_params(path: str, cfg):
    """Load generator params from a flax msgpack or a reference .pth."""
    mods = TSNetModules(cfg)
    template = mods.init_generator_params(__import__("jax").random.PRNGKey(0))
    if path and os.path.isfile(path):
        if path.endswith(".pth"):
            from ..compat import load_reference_checkpoint
            params, example = load_reference_checkpoint(path, cfg)
            print(f"=> loaded reference checkpoint {path} (example {example})")
            return params
        from flax import serialization
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if isinstance(raw, dict) and "gen_params" in raw:
            # full trainer snapshot (TSNetTrainState): demos need only
            # the generator subnets, like the reference demo loading the
            # trainer's .pth (demo/demo_face.py:126-129)
            raw = raw["gen_params"]
        params = serialization.from_state_dict(template, raw)
        print(f"=> loaded checkpoint {path}")
        return params
    print("=> no checkpoint found, using random init (demo smoke mode)")
    return template


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default="/root/reference/demo/face_examples")
    p.add_argument("--subject", default="val024")
    p.add_argument("--driving", default="test114")
    p.add_argument("--restore-from", default="")
    p.add_argument("--out-dir", default="demo_face_out")
    p.add_argument("--n-source", type=int, default=3)
    p.add_argument("--max-frames", type=int, default=30)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--precision", default="high",
                   choices=["highest", "high", "default"],
                   help="MXU precision (high: 1.2e-3 L1 drift, 1.6x faster)")
    p.add_argument("--fast-trunk", action="store_true",
                   help="encoders at 1-pass bf16 MXU (4.7e-4 display drift; artifacts/round5/fast_trunk_drift.json)")
    p.add_argument("--fast-tail", action="store_true",
                   help="bf16 fuse+decoder tail (extra speed, small drift)")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    random.seed(args.seed)
    import dataclasses
    cfg = dataclasses.replace(face_config(), precision=args.precision,
                              fast_tail=args.fast_tail,
                              fast_trunk=args.fast_trunk)
    params = load_params(args.restore_from, cfg)

    dataset = FaceDatasetTest(
        sub_images_path=os.path.join(args.data_root, "images", args.subject),
        sub_labels_path=os.path.join(args.data_root, "labels", args.subject),
        dri_images_path=os.path.join(args.data_root, "images", args.driving),
        dri_labels_path=os.path.join(args.data_root, "labels", args.driving),
        max_frame_num=args.max_frames,
    )
    sample = dataset[0]
    src, tar = sample["src"], sample["tar"]
    n_src_frames = src["img"].shape[0]
    ref_idx = random.sample(range(n_src_frames), args.n_source)
    print(f"reference frames: {ref_idx}")

    engine = ClipInference(cfg, params, chunk=args.chunk)
    t0 = time.time()
    rec = engine.run_renormalized(
        src["img"][ref_idx],
        src["lbl"][ref_idx], src["bbox"][ref_idx],
        tar["lbl"], tar["bbox"])
    n_frames = rec.shape[0]
    dt = time.time() - t0
    print(f"The total test time is {dt:.3f}s "
          f"({n_frames / dt:.2f} frames/sec)")

    os.makedirs(args.out_dir, exist_ok=True)
    frames = []
    for i in range(n_frames):
        src_disp = (to_display_rgb(src["img"][i] / 255.0, IMG_MEAN)
                    if i < n_src_frames else
                    np.zeros_like(to_display_rgb(rec[0], IMG_MEAN)))
        row = montage_row([
            src_disp,
            to_display_rgb(tar["img"][i] / 255.0, IMG_MEAN),
            to_display_rgb(rec[i], IMG_MEAN),
        ])
        row.save(os.path.join(
            args.out_dir, f"{i:06d}_{args.subject}_{tar['names'][i]}"))
        frames.append(np.asarray(row))
    save_gif(os.path.join(args.out_dir,
                          f"{args.subject}_{args.driving}.gif"), frames)
    print(f"wrote {n_frames} montages + GIF to {args.out_dir}")


if __name__ == "__main__":
    main()
