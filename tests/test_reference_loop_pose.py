"""End-to-end POSE parity through the ACTUAL reference implementation.

Round-3 VERDICT gap #3: the face model had live reference-stack parity
(`tests/test_reference_loop.py`) but the pose variant
(/root/reference/model/TSNet_pose.py:206-596 — use_mask compositing,
no align loss, netDF) had never been closed through the reference's own
code. This test exports our pose generator params to the reference .pth
format, loads them into the reference's live `model/TSNet_pose.py` on
torch-CPU (demo/demo_pose.py:120-133 load semantics), runs both stacks
on the bundled dance clip (identical preprocessed inputs from our
PoseDatasetTest), and asserts mean L1 <= 0.01.

Weights: the newest trained pose snapshot under runs/ when present
(not committed — see artifacts/round4/pose_ref_loop/parity.json for the
trained-weights run), else seeded random init. Either way both stacks
execute live.
"""

import os

import numpy as np
import pytest

import jax

from wacv23_tsnet_tpu import compat
from wacv23_tsnet_tpu.configs import pose_config
from wacv23_tsnet_tpu.data.datasets import PoseDatasetTest
from wacv23_tsnet_tpu.infer import ClipInference
from wacv23_tsnet_tpu.models import TSNetModules

REF = "/root/reference"
needs_reference = pytest.mark.skipif(not os.path.isdir(REF),
                                     reason="reference mount not present")

SNAPSHOT_CANDIDATES = [
    "runs/pose_round4/snapshots",
    "runs/pose_bs10/snapshots",
]


def _load_params(cfg):
    mods = TSNetModules(cfg)
    template = mods.init_generator_params(jax.random.PRNGKey(0))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in SNAPSHOT_CANDIDATES:
        d = os.path.join(repo, rel)
        if os.path.isdir(d):
            snaps = sorted(f for f in os.listdir(d) if f.endswith(".msgpack"))
            if snaps:
                from flax import serialization
                with open(os.path.join(d, snaps[-1]), "rb") as f:
                    raw = serialization.msgpack_restore(f.read())
                if isinstance(raw, dict) and "gen_params" in raw:
                    raw = raw["gen_params"]
                return (serialization.from_state_dict(template, raw),
                        os.path.join(rel, snaps[-1]))
    return template, "random-init"


@needs_reference
def test_reference_loop_pose_parity(tmp_path):
    import dataclasses
    cfg = dataclasses.replace(pose_config(), precision="highest")
    params, source = _load_params(cfg)

    ckpt_path = str(tmp_path / "export_pose.pth")
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
        n_frame_total=6)
    sample = dataset[0]
    src, tar = sample["src"], sample["tar"]
    n_frames = 2
    ref_idx = list(range(cfg.n_source))

    from wacv23_tsnet_tpu.data.codecs import labels_to_onehot
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
    print(f"[ref-loop-pose] weights={source} mean L1={diff.mean():.5f} "
          f"max={diff.max():.4f}")
    assert diff.mean() <= 0.01, (
        f"pose mean L1 {diff.mean():.5f} vs reference stack "
        f"(weights: {source})")
