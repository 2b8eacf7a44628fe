"""Artifact harness for VERDICT round-2 item 5: our trained weights run
through the ACTUAL reference stack vs our stack, bundled val024/test114
clip; writes JSON + montage evidence to artifacts/round3/ref_loop/."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import dataclasses

from wacv23_tsnet_tpu import compat
from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.data.codecs import labels_to_onehot
from wacv23_tsnet_tpu.data.datasets import FaceDatasetTest, IMG_MEAN
from wacv23_tsnet_tpu.infer import ClipInference, montage_row, to_display_rgb
from wacv23_tsnet_tpu.models import TSNetModules

from tests.test_reference_loop import _load_params

OUT = "/root/repo/artifacts/round3/ref_loop"
os.makedirs(OUT, exist_ok=True)
N_FRAMES = 8

cfg = dataclasses.replace(face_config(), precision="highest")
params, source = _load_params(cfg)
print("weights:", source, flush=True)
assert source != "random-init", "need the trained snapshot for the artifact"

ckpt_path = "/tmp/ref_loop_export.pth"
compat.save_reference_checkpoint(ckpt_path, params, cfg)
ref_model = compat.load_reference_tsnet(ckpt_path, n_source=cfg.n_source)
print("reference model loaded", flush=True)

data_root = "/root/reference/demo/face_examples"
dataset = FaceDatasetTest(
    sub_images_path=os.path.join(data_root, "images", "val024"),
    sub_labels_path=os.path.join(data_root, "labels", "val024"),
    dri_images_path=os.path.join(data_root, "images", "test114"),
    dri_labels_path=os.path.join(data_root, "labels", "test114"),
    max_frame_num=N_FRAMES)
sample = dataset[0]
src, tar = sample["src"], sample["tar"]
ref_idx = list(range(cfg.n_source))

src_onehot = labels_to_onehot(src["lbl"][ref_idx], "face")
tar_onehot = labels_to_onehot(tar["lbl"][:N_FRAMES], "face")
print("running reference stack (torch CPU)...", flush=True)
want = compat.run_reference_clip(
    ref_model, src["img"][ref_idx].astype(np.float32), src_onehot,
    src["bbox"][ref_idx].astype(np.float32), tar_onehot,
    tar["bbox"][:N_FRAMES].astype(np.float32))
print("running our stack...", flush=True)
engine = ClipInference(cfg, params, use_pallas=False, chunk=N_FRAMES)
got = engine.run(src["img"][ref_idx], src["lbl"][ref_idx],
                 src["bbox"][ref_idx], tar["lbl"][:N_FRAMES],
                 tar["bbox"][:N_FRAMES])

diff = np.abs(got - want)
per_frame = diff.mean(axis=(1, 2, 3))
record = {
    "weights": source,
    "clip": "val024 (subject) x test114 (driving), first 8 frames",
    "mean_l1": float(diff.mean()),
    "max_abs": float(diff.max()),
    "per_frame_l1": [round(float(v), 6) for v in per_frame],
    "budget": 0.01,
    "reference_load_path": "demo/demo_face.py:123-130 semantics "
                           "(load_reference_tsnet)",
}
with open(os.path.join(OUT, "parity.json"), "w") as f:
    json.dump(record, f, indent=2)
print(json.dumps(record, indent=2), flush=True)

for i in (0, N_FRAMES - 1):
    row = montage_row([
        to_display_rgb(tar["img"][i] / 255.0, IMG_MEAN),
        to_display_rgb(want[i], IMG_MEAN),
        to_display_rgb(got[i], IMG_MEAN),
    ])
    row.save(os.path.join(OUT, f"frame{i:02d}_driving_ref_ours.png"))
print("wrote artifacts to", OUT, flush=True)
