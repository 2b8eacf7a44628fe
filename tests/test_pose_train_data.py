"""PoseDatasetTrain end-to-end over synthetic OpenPose data."""

import json
import random

import numpy as np
import pytest
from PIL import Image

from wacv23_tsnet_tpu.data.datasets import PoseDatasetTrain
from wacv23_tsnet_tpu.data.loader import Loader

RNG = np.random.default_rng(55)


def _synthetic_person(cx, cy, scale=60.0):
    """OpenPose-shaped keypoints for a standing figure, high confidence."""
    def pt(dx, dy):
        return [cx + dx * scale, cy + dy * scale, 0.9]

    pose = np.zeros((25, 3))
    layout = {0: (0, -1.6), 1: (0, -1.2), 2: (-0.4, -1.2), 3: (-0.5, -0.6),
              4: (-0.55, 0.0), 5: (0.4, -1.2), 6: (0.5, -0.6),
              7: (0.55, 0.0), 8: (0, 0.0), 9: (-0.2, 0.0), 10: (-0.25, 0.8),
              11: (-0.25, 1.6), 12: (0.2, 0.0), 13: (0.25, 0.8),
              14: (0.25, 1.6), 15: (-0.1, -1.7), 16: (0.1, -1.7),
              17: (-0.2, -1.65), 18: (0.2, -1.65), 19: (0.3, 1.7),
              20: (0.35, 1.7), 21: (0.2, 1.72), 22: (-0.3, 1.7),
              23: (-0.35, 1.7), 24: (-0.2, 1.72)}
    for k, (dx, dy) in layout.items():
        pose[k] = pt(dx, dy)
    face = np.array([pt(0.05 * np.cos(t), -1.62 + 0.05 * np.sin(t))
                     for t in np.linspace(0, 2 * np.pi, 70)])
    hand = np.array([pt(-0.55 + 0.02 * i, 0.02 * i) for i in range(21)])
    return {
        "pose_keypoints_2d": pose.reshape(-1).tolist(),
        "face_keypoints_2d": face.reshape(-1).tolist(),
        "hand_left_keypoints_2d": hand.reshape(-1).tolist(),
        "hand_right_keypoints_2d": (hand + [0.6 * scale, 0, 0])
        .reshape(-1).tolist(),
    }


@pytest.fixture(scope="module")
def synthetic_pose_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dance")
    video_dict = {}
    for vid in (1, 2):
        vdir = "%05d" % vid
        (root / "labels" / vdir).mkdir(parents=True)
        (root / "images" / vdir).mkdir(parents=True)
        frames = []
        for f in range(6):
            name = f"frame{f:06d}.jpg"
            frames.append(name)
            img = (RNG.random((512, 288, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "images" / vdir / name)
            payload = {"people": [_synthetic_person(140 + 4 * f + vid, 250)]}
            with open(root / "labels" / vdir /
                      (name[:-4] + "_keypoints.json"), "w") as fh:
                json.dump(payload, fh)
        video_dict[str(vid)] = frames
    with open(root / "video_dict.json", "w") as fh:
        json.dump(video_dict, fh)
    return root


def test_pose_train_dataset(synthetic_pose_dataset):
    root = synthetic_pose_dataset
    ds = PoseDatasetTrain(
        json_path=str(root / "video_dict.json"),
        label_path=str(root / "labels"),
        image_path=str(root / "images"),
        n_frame_total=4, is_jitter=True, is_mirror=True, interval=1,
        rng=random.Random(3))
    sample = ds[0]
    assert sample["img"].shape == (4, 3, 256, 256)
    assert sample["lbl"].shape == (4, 256, 256)
    assert sample["lbl"].max() <= 24
    assert sample["lbl"].sum() > 0, "no limbs rasterized"
    assert sample["bbox"].sum() > 0
    # square padding: label content confined to the padded center band
    assert set(np.unique(sample["lbl"][:, :, :40])) == {0}

    loader = Loader(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch["img"].shape == (2, 4, 3, 256, 256)
