"""Temporal keypoint smoothing.

Two smoothers used by the reference:
- `smooth_keypoint_track`: the face test set's 5-frame moving average
  with its exact asymmetric boundary scheme
  (reference dataset_video_face.py:357-379);
- `smooth_valid_track`: the validity-aware variant for OpenPose pose
  tracks, averaging only frames where the point was detected
  (reference dataset/smooth_pose_keypoint.py:86-160).
"""

from __future__ import annotations

import json

import numpy as np


def load_json_tricks(path: str) -> dict:
    """Read a json_tricks-encoded file (ndarrays as {"__ndarray__": ...}).

    The reference's offline smoother writes its smooth_openpose/*.json
    with json_tricks (dataset/smooth_pose_keypoint.py); this decodes the
    ndarray wrapper without the dependency.
    """

    def decode(obj):
        if isinstance(obj, dict):
            if "__ndarray__" in obj:
                return np.asarray(obj["__ndarray__"],
                                  dtype=obj.get("dtype", "float64"))
            return {k: decode(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [decode(v) for v in obj]
        return obj

    with open(path) as f:
        return decode(json.load(f))


def smooth_keypoint_track(track: np.ndarray, win: int = 5) -> np.ndarray:
    """(T, K, 2) -> smoothed (T, K, 2) with the reference boundary scheme.

    frame 0 unchanged; frame 1 = mean of frames 0..2; frame 2 = mean of
    0..4; interior = centered 5-frame mean; frame T-2 = mean of the last
    3; frame T-1 unchanged.
    """
    assert win == 5, "reference hard-codes a 5-frame window"
    track = np.asarray(track, np.float64)
    t = track.shape[0]
    if t < 5:
        # the reference scheme indexes cumsum[4] and would crash here;
        # graceful passthrough for sub-window clips
        return track.copy()
    cs = np.cumsum(track, axis=0)
    out = np.empty_like(track)
    out[0] = track[0]
    out[1] = cs[2] / 3
    out[2] = cs[4] / 5
    out[3:t - 2] = (cs[5:t] - cs[0:t - 5]) / 5
    out[t - 2] = (cs[t - 1] - cs[t - 4]) / 3
    out[t - 1] = track[t - 1]
    return out


def smooth_valid_track(track: np.ndarray) -> np.ndarray:
    """Validity-aware smoother for (T, K, 2) validated keypoint tracks.

    A point is valid when neither coordinate is zero (the convention of
    `valid_keypoints`). Window sums are normalized by the VALID count in
    the window; windows with no valid samples fall back to the original
    point, and the boundary scheme is the same asymmetric one as
    `smooth_keypoint_track` (reference smooth_points,
    dataset/smooth_pose_keypoint.py:86-117).

    Reference quirk reproduced deliberately: the reference's final
    "reset invalid point to be (0, 0)" line indexes with
    `cur_pt_valid == 0` where `cur_pt_valid` is a Python LIST, which
    evaluates to the scalar `False` — an empty selection, so the reset
    never happens and invalid frames keep their window averages
    (smooth_pose_keypoint.py:113-114). Downstream consumers were trained
    against that behavior, so we match it.
    """
    track = np.asarray(track, np.float64)
    t, k, _ = track.shape
    if t < 5:
        # sub-window clips: the reference would index out of bounds
        return track.copy()
    out = np.zeros_like(track)
    for ki in range(k):
        seq = track[:, ki, :]
        cs = np.cumsum(seq, axis=0)
        valid = np.array([0 not in p for p in seq], dtype=np.int64)
        vcs = np.cumsum(valid)
        new = np.zeros_like(seq)
        new[0] = seq[0]
        new[1] = cs[2] / vcs[2] if vcs[2] else seq[1]
        new[2] = cs[4] / vcs[4] if vcs[4] else seq[2]
        for j in range(3, t - 2):
            n = vcs[j + 2] - vcs[j - 3]
            new[j] = (cs[j + 2] - cs[j - 3]) / n if n else seq[j]
        n = vcs[t - 1] - vcs[t - 4]
        new[t - 2] = (cs[t - 1] - cs[t - 4]) / n if n else seq[t - 2]
        new[t - 1] = seq[t - 1]
        out[:, ki, :] = new
    return out


def smooth_openpose_people(frames: list[dict]) -> list[dict]:
    """Smooth validated pose/face/hand tracks across a clip.

    `frames` is a list of dicts of VALIDATED (K, 2) keypoint arrays
    (zeros mean undetected). Returns new dicts with smoothed tracks —
    the offline `smooth_openpose/*.json` stage of the reference
    (dataset/smooth_pose_keypoint.py:121-173).
    """
    keys = [k for k in ("pose", "face", "hand_l", "hand_r")
            if k in frames[0]]
    smoothed = {k: smooth_valid_track(np.stack([f[k] for f in frames]))
                for k in keys}
    return [{k: smoothed[k][i] for k in keys} for i in range(len(frames))]
