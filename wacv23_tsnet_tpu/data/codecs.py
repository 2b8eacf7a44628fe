"""Label codecs: color image <-> class map <-> one-hot channels.

Reimplements reference utils/misc.py:10-85 (im2vl / vl2ch / vl2im) in
vectorized numpy. The 24-entry pose palette is the OpenPose limb color
convention used by the rasterizer; class 0 is background, classes 1..24
map to the palette rows, class 25 would be unused (face edges are the
white entry, index 24 -> class 24).

Face task: binary (background / edge), edge pixels are value 255 in the
rasterized map.
"""

from __future__ import annotations

import numpy as np

# OpenPose limb colors, in rasterizer stamping order:
# 4 head edges, 2 body, 3 right arm, 3 left arm, 3 right leg, 3 left leg,
# then the 5 hand finger colors, then white for face edges.
POSE_PALETTE = np.array([
    [153, 0, 153], [153, 0, 102], [102, 0, 153], [51, 0, 153],
    [153, 0, 51], [153, 0, 0],
    [153, 51, 0], [153, 102, 0], [153, 153, 0],
    [102, 153, 0], [51, 153, 0], [0, 153, 0],
    [0, 153, 51], [0, 153, 102], [0, 153, 153],
    [0, 102, 153], [0, 51, 153], [0, 0, 153],
    [204, 0, 0], [163, 204, 0], [0, 204, 82], [0, 82, 204], [163, 0, 204],
    [255, 255, 255],
], dtype=np.uint8)


def _num_classes(basic_point_only: bool, remove_face_labels: bool) -> int:
    return 19 if (basic_point_only and remove_face_labels) else 25


def image_to_labels(img: np.ndarray, task: str = "pose",
                    basic_point_only: bool = False,
                    remove_face_labels: bool = False) -> np.ndarray:
    """RGB rasterized label image -> integer class map (H, W)."""
    if task == "face":
        return (img == 255).astype(np.uint8)
    # pose: match each pixel against the palette in one broadcast
    flat = img.reshape(-1, 3)
    out = np.zeros(flat.shape[0], dtype=np.uint8)
    for idx, color in enumerate(POSE_PALETTE):
        out[np.all(flat == color, axis=1)] = idx + 1
    return out.reshape(img.shape[:2])


def labels_to_image(lbl: np.ndarray, task: str = "pose",
                    basic_point_only: bool = False,
                    remove_face_labels: bool = False) -> np.ndarray:
    """Integer class map -> displayable image (uint8)."""
    if task == "face":
        return np.where(lbl == 1, 255, 0).astype(np.uint8)
    n = _num_classes(basic_point_only, remove_face_labels)
    lut = np.zeros((n, 3), dtype=np.uint8)
    lut[1:n] = POSE_PALETTE[: n - 1]
    return lut[np.clip(lbl, 0, n - 1)]


def labels_to_onehot(lbl: np.ndarray, task: str = "pose",
                     basic_point_only: bool = False,
                     remove_face_labels: bool = False) -> np.ndarray:
    """(..., H, W) class map -> (..., num_classes, H, W) float one-hot.

    Channel-first to mirror the reference `vl2ch` contract the drivers
    rely on (train_face.py:247-248).
    """
    n = 2 if task == "face" else _num_classes(basic_point_only,
                                              remove_face_labels)
    lbl = np.asarray(lbl)
    onehot = (lbl[..., None, :, :] ==
              np.arange(n).reshape((n, 1, 1))).astype(np.float32)
    return onehot
