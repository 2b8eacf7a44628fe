"""fast_trunk for POSE inference: output-drift + fps measurement (round 5).

Companion to fast_trunk_drift.py (face). The face measurement adopted
the 1-pass bf16 encoder trunk for inference (drift 0.00047 display L1,
+7.6% fps); this script produces the same evidence for the pose variant
(label_nc=25, netDF-trained weights, fg-mask compositing) on the real
chip + the bundled dance clip, so the pose bench tier can adopt (or
reject) fast_trunk on its own numbers instead of inheriting face's.

  tier A (current pose bench tier): precision=high, fast_tail=True
  tier B (candidate):               A + fast_trunk=True
  tier R (bit-parity anchor):       precision=highest

Checkpoint: a short real training run on the bundled dance data
(runs/pose_ft/, cli.train_pose) — plausible weights, NOT reference-grade.

Budget (stated before measuring, same as face): adopt only if
B-vs-A display mean L1 <= 0.005 and B-vs-R <= 0.01 and fps_B > fps_A.

Run on chip:  python artifacts/round5/pose_fast_trunk_drift.py [ckpt]
Writes artifacts/round5/pose_fast_trunk_drift.json.
"""

from __future__ import annotations

import dataclasses
import functools
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
import jax.numpy as jnp                                        # noqa: E402

from wacv23_tsnet_tpu.cli.eval_snapshots import load_pose_self_clip  # noqa: E402
from wacv23_tsnet_tpu.configs import pose_config               # noqa: E402
from wacv23_tsnet_tpu.data.datasets import IMG_MEAN            # noqa: E402
from wacv23_tsnet_tpu.infer.metrics import ssim                # noqa: E402
from wacv23_tsnet_tpu.infer.pipeline import ClipInference      # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip   # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "pose_fast_trunk_drift.json")
DATA = "/root/reference/demo/dance_example"


def tier_cfg(name):
    base = pose_config()
    if name == "R":
        return base
    if name == "A":
        return dataclasses.replace(base, precision="high", fast_tail=True)
    if name == "B":
        return dataclasses.replace(base, precision="high", fast_tail=True,
                                   fast_trunk=True)
    raise ValueError(name)


def load_params(ckpt, cfg):
    mods = TSNetModules(cfg)
    template = mods.init_generator_params(jax.random.PRNGKey(0))
    if not ckpt:
        print("[pose-drift] no checkpoint: random init")
        return template
    from flax import serialization
    with open(ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "gen_params" in raw:
        raw = raw["gen_params"]
    return serialization.from_state_dict(template, raw)


def display(rec_chw):
    mean = np.asarray(IMG_MEAN, np.float32) / 255.0
    img = rec_chw.transpose(0, 2, 3, 1) + mean
    return np.clip(img, 0.0, 1.0)[..., ::-1]


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    if ckpt is None:
        snaps = sorted(glob.glob(os.path.join(
            REPO, "runs", "pose_ft", "snapshots", "TSNet_S*.msgpack")))
        ckpt = snaps[-1] if snaps else ""
    print(f"[pose-drift] checkpoint: {ckpt or 'RANDOM INIT'}")

    mean = pose_config().img_mean_array()
    imgs, lbls, boxes = load_pose_self_clip(DATA, "00110", 24, mean)
    s = 3
    src_imgs, src_lbls, src_boxes = imgs[:s], lbls[:s], boxes[:s]
    tar_lbls, tar_boxes = lbls[s:], boxes[s:]

    recs = {}
    for name in ("R", "A", "B"):
        cfg = tier_cfg(name)
        params = load_params(ckpt, cfg)
        engine = ClipInference(cfg, params, chunk=16)
        recs[name] = engine.run_renormalized(
            src_imgs, src_lbls, src_boxes, tar_lbls, tar_boxes)
        print(f"[pose-drift] tier {name} done ({recs[name].shape[0]} frames)")

    disp = {k: display(v) for k, v in recs.items()}
    result = {"checkpoint": ckpt, "frames": int(recs["A"].shape[0]),
              "budget": {"B_vs_A_mean_l1": 0.005, "B_vs_R_mean_l1": 0.01}}
    for a, b in (("B", "A"), ("B", "R"), ("A", "R")):
        l1 = float(np.mean(np.abs(disp[a] - disp[b])))
        ss = float(np.mean(np.asarray(ssim(disp[a], disp[b]))))
        result[f"{a}_vs_{b}"] = {"display_mean_l1": round(l1, 6),
                                 "ssim": round(ss, 5)}
        print(f"[pose-drift] {a} vs {b}: L1 {l1:.5f}  SSIM {ss:.4f}")

    # throughput at the pose bench shape (bench.py measure_pose)
    rng = np.random.default_rng(0)
    F, S, HW, L = 256, 3, 256, 25
    args = None
    for name in ("A", "B"):
        cfg = tier_cfg(name)
        mods = TSNetModules(cfg)
        params = mods.init_generator_params(jax.random.PRNGKey(0))
        if args is None:
            args_np = (
                rng.random((S, HW, HW, 3), np.float32),
                rng.integers(0, 2, (S, HW, HW, L)).astype(np.float32),
                rng.integers(0, 2, (S, HW, HW)).astype(np.float32),
                rng.integers(0, 2, (F, HW, HW, L)).astype(np.float32),
                rng.integers(0, 2, (F, HW, HW)).astype(np.float32),
            )
            args = tuple(jnp.asarray(a) for a in args_np)
        fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
        fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
        t0 = time.perf_counter()
        float(fn(params, *args))
        print(f"[pose-drift] tier {name} compile+1st "
              f"{time.perf_counter()-t0:.1f}s")
        iters = 10
        t0 = time.perf_counter()
        sums = [fn(params, *args) for _ in range(iters)]
        for s_ in sums:
            float(s_)
        fps = F / ((time.perf_counter() - t0) / iters)
        result[f"fps_{name}"] = round(fps, 2)
        print(f"[pose-drift] tier {name}: {fps:.2f} frames/sec/chip")
        del fn, fwd, mods, params

    adopt = (result["B_vs_A"]["display_mean_l1"] <= 0.005
             and result["B_vs_R"]["display_mean_l1"] <= 0.01
             and result["fps_B"] > result["fps_A"] * 1.02)
    result["adopt_fast_trunk_pose"] = bool(adopt)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[pose-drift] adopt={adopt}; wrote {OUT}")


if __name__ == "__main__":
    main()
