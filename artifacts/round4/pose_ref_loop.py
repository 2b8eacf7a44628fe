"""Pose parity through the ACTUAL reference stack with TRAINED weights.

Loads the round-4 pose snapshot (runs/pose_round4), exports it to the
reference .pth format, drives /root/reference/model/TSNet_pose.py live
on torch-CPU over the bundled dance clip (110 subject x 164 driving),
runs our stack on identical inputs, and writes
artifacts/round4/pose_ref_loop/{parity.json, montage png}.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from wacv23_tsnet_tpu import compat
from wacv23_tsnet_tpu.configs import pose_config
from wacv23_tsnet_tpu.data.codecs import labels_to_onehot
from wacv23_tsnet_tpu.data.datasets import PoseDatasetTest
from wacv23_tsnet_tpu.infer import ClipInference
from wacv23_tsnet_tpu.models import TSNetModules

import dataclasses

REF = "/root/reference"
OUT = "/root/repo/artifacts/round4/pose_ref_loop"
SNAP_DIR = "/root/repo/runs/pose_round4/snapshots"

cfg = dataclasses.replace(pose_config(), precision="highest")
mods = TSNetModules(cfg)
template = mods.init_generator_params(jax.random.PRNGKey(0))
snaps = sorted(f for f in os.listdir(SNAP_DIR) if f.endswith(".msgpack"))
assert snaps, f"no snapshots in {SNAP_DIR}"
from flax import serialization
with open(os.path.join(SNAP_DIR, snaps[-1]), "rb") as f:
    raw = serialization.msgpack_restore(f.read())
if isinstance(raw, dict) and "gen_params" in raw:
    raw = raw["gen_params"]
params = serialization.from_state_dict(template, raw)
weights = os.path.join("runs/pose_round4/snapshots", snaps[-1])
print(f"weights: {weights}", flush=True)

os.makedirs(OUT, exist_ok=True)
ckpt_path = os.path.join(OUT, "export_pose.pth")
compat.save_reference_checkpoint(ckpt_path, params, cfg)
ref_model = compat.load_reference_tsnet_pose(
    ckpt_path, n_source=cfg.n_source, n_blocks=cfg.dec_n_blocks,
    n_downsampling=cfg.n_downsampling, label_nc=cfg.label_nc)

json_root = os.path.join(REF, "dataset", "json_pose")
data_root = os.path.join(REF, "demo", "dance_example")
dataset = PoseDatasetTest(
    test_pairs=["110 164"],
    sub_json_path=os.path.join(json_root, "clean_video_dict.json"),
    msk_json_path=os.path.join(json_root, "clean_unseen_video_dict.json"),
    label_path=os.path.join(data_root, "labels"),
    smooth_label_path=os.path.join(json_root, "smooth_openpose"),
    image_path=os.path.join(data_root, "images"),
    n_frame_total=12)
sample = dataset[0]
src, tar = sample["src"], sample["tar"]
n_frames = 8
ref_idx = [0, 1, 2]

src_onehot = labels_to_onehot(src["lbl"][ref_idx], "pose")
tar_onehot = labels_to_onehot(tar["lbl"][:n_frames], "pose")
want = compat.run_reference_clip(
    ref_model, src["img"][ref_idx].astype(np.float32), src_onehot,
    src["bbox"][ref_idx].astype(np.float32), tar_onehot,
    tar["bbox"][:n_frames].astype(np.float32))

engine = ClipInference(cfg, params, use_pallas=False, chunk=n_frames)
got = engine.run(src["img"][ref_idx], src["lbl"][ref_idx],
                 src["bbox"][ref_idx], tar["lbl"][:n_frames],
                 tar["bbox"][:n_frames])

diff = np.abs(got - want)
per_frame = [float(d) for d in diff.reshape(n_frames, -1).mean(axis=1)]
rec = {
    "weights": weights,
    "clip": "110 (subject) x 164 (driving, retargeted), first 8 frames",
    "mean_l1": float(diff.mean()),
    "max_abs": float(diff.max()),
    "per_frame_l1": per_frame,
    "budget": 0.01,
    "reference_load_path": "demo/demo_pose.py:120-133 semantics "
                           "(load_reference_tsnet_pose, model/TSNet_pose.py "
                           "live with use_mask compositing)",
}
with open(os.path.join(OUT, "parity.json"), "w") as f:
    json.dump(rec, f, indent=2)
print(json.dumps(rec, indent=2), flush=True)
assert diff.mean() <= 0.01

# montage: driving label | reference-stack rec | our rec (frame 0 and 4)
from wacv23_tsnet_tpu.data.codecs import labels_to_image
from wacv23_tsnet_tpu.infer import montage_row, to_display_rgb
from wacv23_tsnet_tpu.data.datasets import IMG_MEAN
for fi in (0, 4):
    row = montage_row([
        labels_to_image(tar["lbl"][fi], "pose"),
        to_display_rgb(want[fi], IMG_MEAN),
        to_display_rgb(got[fi], IMG_MEAN),
    ])
    row.save(os.path.join(OUT, f"frame{fi:02d}_driving_ref_ours.png"))
print("montages written", flush=True)
