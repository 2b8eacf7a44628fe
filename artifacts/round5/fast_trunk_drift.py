"""fast_trunk inference tier: output-drift + fps measurement (round 5).

VERDICT r04 Next #1: "Ship a measured 1-pass bf16-trunk INFERENCE tier
with an output quality budget." This script produces the adoption
evidence on the real chip + the real bundled demo clips:

  tier A (current bench tier): precision=high, fast_tail=True
  tier B (candidate):          A + fast_trunk=True  (encoders at 1-pass
                               bf16 MXU; similarity math unchanged)
  tier R (bit-parity anchor):  precision=highest, no fast knobs

Drift is measured the way a user sees it: display-space ([0,1] RGB,
after the demo renorm to the reference frame's mean/std,
demo/demo_face.py:178-198) mean L1 and SSIM of tier B vs tier A AND vs
tier R (the 0.01 absolute parity budget from README). Throughput is the
bench shape (256-frame clip, pipelined x10 dispatch).

Run on chip:  python artifacts/round5/fast_trunk_drift.py [ckpt.msgpack]
Writes artifacts/round5/fast_trunk_drift.json.

Budget (stated before measuring): adopt fast_trunk as the bench tier
only if (a) mean display L1 of B vs A <= 0.005 and (b) B vs R stays
inside the 0.01 absolute budget; otherwise commit this JSON as the
measured rejection.
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

from wacv23_tsnet_tpu.configs import face_config               # noqa: E402
from wacv23_tsnet_tpu.data.datasets import FaceDatasetTest, IMG_MEAN  # noqa: E402
from wacv23_tsnet_tpu.infer.metrics import ssim                # noqa: E402
from wacv23_tsnet_tpu.infer.pipeline import ClipInference      # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip   # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "fast_trunk_drift.json")
DATA = "/root/reference/demo/face_examples"


def tier_cfg(name):
    base = face_config()
    if name == "R":
        return base  # precision=highest, no fast knobs
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
        print("[drift] no checkpoint given: random init")
        return template
    from flax import serialization
    with open(ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "gen_params" in raw:
        raw = raw["gen_params"]
    return serialization.from_state_dict(template, raw)


def display(rec_chw):
    """(F,3,H,W) model space -> (F,H,W,3) float RGB in [0,1]."""
    mean = np.asarray(IMG_MEAN, np.float32) / 255.0
    img = rec_chw.transpose(0, 2, 3, 1) + mean
    return np.clip(img, 0.0, 1.0)[..., ::-1]


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    if ckpt is None:
        snaps = sorted(glob.glob(os.path.join(
            REPO, "runs", "quality_trend", "snapshots", "TSNet_S*.msgpack")))
        ckpt = snaps[-1] if snaps else ""
    print(f"[drift] checkpoint: {ckpt or 'RANDOM INIT'}")

    dataset = FaceDatasetTest(
        sub_images_path=os.path.join(DATA, "images", "val024"),
        sub_labels_path=os.path.join(DATA, "labels", "val024"),
        dri_images_path=os.path.join(DATA, "images", "test114"),
        dri_labels_path=os.path.join(DATA, "labels", "test114"),
        max_frame_num=30,
    )
    sample = dataset[0]
    src, tar = sample["src"], sample["tar"]
    ref_idx = [0, 1, 2]

    recs = {}
    for name in ("R", "A", "B"):
        cfg = tier_cfg(name)
        params = load_params(ckpt, cfg)
        engine = ClipInference(cfg, params, chunk=32)
        recs[name] = engine.run_renormalized(
            src["img"][ref_idx], src["lbl"][ref_idx], src["bbox"][ref_idx],
            tar["lbl"], tar["bbox"])
        print(f"[drift] tier {name} done ({recs[name].shape[0]} frames)")

    disp = {k: display(v) for k, v in recs.items()}
    result = {"checkpoint": ckpt, "frames": int(recs["A"].shape[0]),
              "budget": {"B_vs_A_mean_l1": 0.005, "B_vs_R_mean_l1": 0.01}}
    for a, b in (("B", "A"), ("B", "R"), ("A", "R")):
        l1 = float(np.mean(np.abs(disp[a] - disp[b])))
        ss = float(np.mean(np.asarray(ssim(disp[a], disp[b]))))
        result[f"{a}_vs_{b}"] = {"display_mean_l1": round(l1, 6),
                                 "ssim": round(ss, 5)}
        print(f"[drift] {a} vs {b}: display L1 {l1:.5f}  SSIM {ss:.4f}")

    # ---- throughput at the bench shape ---------------------------------
    rng = np.random.default_rng(0)
    F, S, HW, L = 256, 3, 256, 2
    src_img = jnp.asarray(rng.random((S, HW, HW, 3), np.float32))
    src_lbl = jnp.asarray(rng.integers(0, 2, (S, HW, HW, L)).astype(np.float32))
    src_bbox = jnp.asarray(rng.integers(0, 2, (S, HW, HW)).astype(np.float32))
    tar_lbl = jnp.asarray(rng.integers(0, 2, (F, HW, HW, L)).astype(np.float32))
    tar_bbox = jnp.asarray(rng.integers(0, 2, (F, HW, HW)).astype(np.float32))
    for name in ("A", "B"):
        cfg = tier_cfg(name)
        mods = TSNetModules(cfg)
        params = mods.init_generator_params(jax.random.PRNGKey(0))
        fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
        fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
        args = (params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox)
        t0 = time.perf_counter()
        float(fn(*args))
        print(f"[drift] tier {name} compile+1st {time.perf_counter()-t0:.1f}s")
        iters = 10
        t0 = time.perf_counter()
        sums = [fn(*args) for _ in range(iters)]
        for s_ in sums:
            float(s_)
        fps = F / ((time.perf_counter() - t0) / iters)
        result[f"fps_{name}"] = round(fps, 2)
        print(f"[drift] tier {name}: {fps:.2f} frames/sec/chip")
        del fn, fwd, mods, params

    adopt = (result["B_vs_A"]["display_mean_l1"] <= 0.005
             and result["B_vs_R"]["display_mean_l1"] <= 0.01
             and result["fps_B"] > result["fps_A"] * 1.02)
    result["adopt_fast_trunk"] = bool(adopt)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[drift] adopt_fast_trunk={adopt}; wrote {OUT}")


if __name__ == "__main__":
    main()
