"""Serving-path benchmark, POSE variant: RetargetSession on chip.

Companion to serve_bench.py (face). The pose keypoint path is the
strongest version of the "only keypoints cross the host boundary"
serving story: a driving frame uploads as (137, 2) float keypoints
(~1 KB) instead of a 256² label map, and rasterization (OpenPose limbs
+ face + hands), one-hot expansion, bbox derivation, synthesis, and the
display conversion all run on the TPU; frames come back uint8.

Measures push_keypoints at serving chunk sizes with the uint8 display
wire + pipelined dispatch (the adopted face recipe), on the adopted
pose inference tier (high + fast_tail + fast_trunk), with the
netDF-trained checkpoint when available.

Run on chip:  python artifacts/round5/serve_bench_pose.py
Writes artifacts/round5/serve_bench_pose.json.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax                                                     # noqa: E402

from wacv23_tsnet_tpu.configs import pose_config               # noqa: E402
from wacv23_tsnet_tpu.infer.streaming import RetargetSession   # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "serve_bench_pose.json")
F, S, HW, L = 256, 3, 256, 25


def main():
    cfg = dataclasses.replace(pose_config(), precision="high",
                              fast_tail=True, fast_trunk=True)
    mods = TSNetModules(cfg)
    ckpts = sorted(glob.glob(os.path.join(
        REPO, "runs", "pose_ft", "snapshots", "TSNet_S*.msgpack")))
    if ckpts:
        from flax import serialization
        template = mods.init_generator_params(jax.random.PRNGKey(0))
        with open(ckpts[-1], "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        params = serialization.from_state_dict(
            template, raw.get("gen_params", raw))
        print(f"[serve-pose] checkpoint {ckpts[-1]}")
    else:
        params = mods.init_generator_params(jax.random.PRNGKey(0))
        print("[serve-pose] random init")

    rng = np.random.default_rng(0)
    src_img = rng.random((S, HW, HW, 3), np.float32)
    src_lbl = rng.integers(0, 2, (S, HW, HW, L)).astype(np.float32)
    src_bbox = rng.integers(0, 2, (S, HW, HW)).astype(np.float32)
    # plausible validated keypoints inside the fg columns (64..192 rule)
    kps = np.zeros((F, 137, 2), np.float32)
    kps[..., 0] = rng.uniform(70, 190, (F, 137))
    kps[..., 1] = rng.uniform(10, 250, (F, 137))

    results = {"frames": F,
               "config": "pose 256^2, n_source=3, label_nc=25, "
                         "high + fast_tail + fast_trunk (the bench tier), "
                         "uint8 display wire"}
    for chunk in (8, 16, 32):
        for depth in (0, 4):
            sess = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                                   chunk=chunk, pipeline_depth=depth,
                                   output="display")
            sess.push_keypoints(kps[:chunk])                  # compile
            t0 = time.perf_counter()
            sess.push_keypoints(kps[:chunk])
            lat = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter()
            out = sess.push_keypoints(kps)
            fps = F / (time.perf_counter() - t0)
            assert out.shape == (F, HW, HW, 3) and out.dtype == np.uint8
            key = f"keypoints_u8out_chunk{chunk}_depth{depth}"
            results[key] = {"fps": round(fps, 1),
                            "chunk_latency_ms": round(lat, 1)}
            print(f"[serve-pose] chunk={chunk} depth={depth}: "
                  f"{fps:7.1f} fps, {lat:6.1f} ms/chunk", flush=True)
            del sess

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[serve-pose] wrote {OUT}")


if __name__ == "__main__":
    main()
