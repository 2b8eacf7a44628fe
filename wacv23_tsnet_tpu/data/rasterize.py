"""OpenPose keypoint -> edge-image rasterization (host-side, numpy).

Fresh implementation of the reference's rasterizer behavior
(reference utils/keypoint2img.py:21-354): confidence-thresholded
keypoints, per-limb quadratic least-squares curve interpolation, square
brush stamping with circular endpoint dots, OpenPose limb colors.

Deliberate implementation differences (behavior-preserving):
- quadratic/linear fits use `np.polyfit` (same least-squares solution as
  scipy `curve_fit` on a polynomial model, without the iterative solver);
- brush stamping is vectorized over curve points instead of nested
  Python loops over offsets (same pixels, same overwrite order).

This is the CPU "oracle" tier; `rasterize_jax.py` holds the on-device
segment-distance rasterizer used for streaming pipelines (SURVEY.md §7
step 5 documents the two-tier split).
"""

from __future__ import annotations

import json
import math
import random as _random
from typing import Optional, Sequence

import numpy as np

from .codecs import POSE_PALETTE

# ---------------------------------------------------------------------------
# skeleton topology (OpenPose BODY_25 / 21-pt hands / 70-pt face)
# ---------------------------------------------------------------------------

POSE_EDGES_BASIC = [
    (17, 15), (15, 0), (0, 16), (16, 18),      # head
    (0, 1), (1, 8),                            # body
    (1, 2), (2, 3), (3, 4),                    # right arm
    (1, 5), (5, 6), (6, 7),                    # left arm
    (8, 9), (9, 10), (10, 11),                 # right leg
    (8, 12), (12, 13), (13, 14),               # left leg
]
POSE_EDGES_FEET = [
    (11, 24), (11, 22), (22, 23),              # right foot
    (14, 21), (14, 19), (19, 20),              # left foot
]
# colors for the feet edges repeat the leg colors
_FEET_COLORS = [[0, 153, 153]] * 3 + [[0, 0, 153]] * 3

HAND_FINGERS = [
    (0, 1, 2, 3, 4),
    (0, 5, 6, 7, 8),
    (0, 9, 10, 11, 12),
    (0, 13, 14, 15, 16),
    (0, 17, 18, 19, 20),
]

FACE_SEGMENTS = [
    [list(range(0, 17))],
    [list(range(17, 22))],
    [list(range(22, 27))],
    [[28, 31], list(range(31, 36)), [35, 28]],
    [[36, 37, 38, 39], [39, 40, 41, 36]],
    [[42, 43, 44, 45], [45, 46, 47, 42]],
    [list(range(48, 55)), [54, 55, 56, 57, 58, 59, 48]],
]


def pose_edge_colors(basic_point_only: bool):
    edges = list(POSE_EDGES_BASIC)
    colors = [list(c) for c in POSE_PALETTE[:18]]
    if not basic_point_only:
        edges += POSE_EDGES_FEET
        colors += _FEET_COLORS
    return edges, colors


HAND_COLORS = [list(c) for c in POSE_PALETTE[18:23]]


# ---------------------------------------------------------------------------
# curve interpolation + stamping
# ---------------------------------------------------------------------------

def _fit_axis(t: np.ndarray, v: np.ndarray):
    """Least-squares v = poly(t); unit-step samples along t."""
    try:
        if len(t) < 3:
            coef = np.polyfit(t, v, 1)
        else:
            coef = np.polyfit(t, v, 2)
            if abs(coef[0]) > 1:       # reject wild quadratics (ref :334)
                return None, None
    except Exception:
        return None, None
    if not np.all(np.isfinite(coef)):
        return None, None
    if t[0] > t[-1]:
        t = t[::-1]
    ts = np.linspace(t[0], t[-1], math.ceil(t[-1] - t[0]))
    return ts, np.polyval(coef, ts)


def interp_curve(x: Sequence[float], y: Sequence[float]):
    """Interpolate keypoints into integer pixel curves (ref :319-354).

    Fits along the axis with the larger consecutive span; returns
    (curve_x, curve_y) int arrays or (None, None) on degenerate fits.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if len(x) < 2:
        return None, None
    if np.abs(np.diff(x)).max() < np.abs(np.diff(y)).max():
        ts, vs = _fit_axis(y, x)
        if ts is None:
            return None, None
        return vs.astype(int), ts.astype(int)
    ts, vs = _fit_axis(x, y)
    if ts is None:
        return None, None
    return ts.astype(int), vs.astype(int)


def stamp_edge(img: np.ndarray, curve_x, curve_y, bw: int = 1,
               color=(255, 255, 255), endpoints: bool = False) -> None:
    """Stamp a curve with a (2bw)^2 square brush, in place (ref :298-315).

    Offsets span [-bw, bw) on both axes, clipped at the borders; endpoint
    dots fill the radius-2bw disk (i^2 + j^2 < 4 bw^2).
    """
    if curve_x is None or len(curve_x) == 0:
        return
    h, w = img.shape[:2]
    xs = np.asarray(curve_x)
    ys = np.asarray(curve_y)
    off = np.arange(-bw, bw)
    oy, ox = np.meshgrid(off, off, indexing="ij")
    yy = np.clip(ys[None, :] + oy.reshape(-1, 1), 0, h - 1)
    xx = np.clip(xs[None, :] + ox.reshape(-1, 1), 0, w - 1)
    img[yy, xx] = color if img.ndim == 3 else color[0]

    if endpoints:
        off2 = np.arange(-2 * bw, 2 * bw)
        oy, ox = np.meshgrid(off2, off2, indexing="ij")
        disk = (oy ** 2 + ox ** 2) < 4 * bw * bw
        oy, ox = oy[disk], ox[disk]
        for ex, ey in ((xs[0], ys[0]), (xs[-1], ys[-1])):
            yy = np.clip(ey + oy, 0, h - 1)
            xx = np.clip(ex + ox, 0, w - 1)
            img[yy, xx] = color if img.ndim == 3 else color[0]


def draw_edge(img: np.ndarray, x, y, bw: int = 1, color=(255, 255, 255),
              endpoints: bool = False) -> None:
    """Fit + stamp one keypoint edge, native C++ fast path when built.

    Semantics identical to interp_curve + stamp_edge (the native library
    implements the same LSQ fit / casts / clamping; parity-tested in
    tests/test_native.py).
    """
    from ..native import native_draw_edge

    if native_draw_edge(img, x, y, bw, color, endpoints):
        return
    cx, cy = interp_curve(x, y)
    stamp_edge(img, cx, cy, bw=bw, color=color, endpoints=endpoints)


# ---------------------------------------------------------------------------
# keypoint extraction + full-person rendering
# ---------------------------------------------------------------------------

def valid_keypoints(pts: np.ndarray) -> np.ndarray:
    """Zero out low-confidence keypoints (ref extract_valid_keypoints).

    pts: (N, 3) [x, y, confidence]. Face (N=70) uses threshold 0.1 and
    requires a whole 2-point segment valid; hands (N=21) require whole
    finger-segment validity at 0.01; body uses per-point validity.
    """
    n = pts.shape[0]
    thr = 0.1 if n == 70 else 0.01
    out = np.zeros((n, 2))
    if n == 70:
        for seg_list in FACE_SEGMENTS:
            for seg in seg_list:
                idx = np.asarray(seg)
                if (pts[idx, 2] > thr).all():
                    out[idx] = pts[idx, :2]
    elif n == 21:
        for finger in HAND_FINGERS:
            idx = np.asarray(finger)
            if (pts[idx, 2] > thr).all():
                out[idx] = pts[idx, :2]
    else:
        keep = pts[:, 2] > thr
        out[keep] = pts[keep, :2]
    return out


def parse_openpose_json(source) -> list[dict[str, np.ndarray]]:
    """Parse an OpenPose output JSON (path or raw string) into arrays."""
    if isinstance(source, (str, bytes)) and "{" not in str(source)[:64]:
        with open(source, encoding="utf-8") as f:
            payload = json.load(f)
    else:
        payload = json.loads(source)
    people = []
    for person in payload["people"]:
        people.append({
            "pose": np.asarray(person["pose_keypoints_2d"],
                               np.float64).reshape(25, 3),
            "face": np.asarray(person["face_keypoints_2d"],
                               np.float64).reshape(70, 3),
            "hand_l": np.asarray(person["hand_left_keypoints_2d"],
                                 np.float64).reshape(21, 3),
            "hand_r": np.asarray(person["hand_right_keypoints_2d"],
                                 np.float64).reshape(21, 3),
        })
    return people


def render_person(pose, face, hand_l, hand_r, size, train: bool,
                  rng: Optional[_random.Random] = None,
                  basic_point_only: bool = False,
                  remove_face_labels: bool = False) -> np.ndarray:
    """Rasterize one person's validated keypoints (ref connect_keypoints).

    `size` is (w, h). Brush widths: train-time randomized (pose 2..4,
    hand/face 1..2), test-time derived from the person's pixel height.
    """
    rng = rng or _random
    w, h = size
    img = np.zeros((h, w, 3), np.uint8)
    y_extent = int(pose[:, 1].max() - pose[:, 1].min())

    edges, colors = pose_edge_colors(basic_point_only)
    bw = rng.randrange(2, 5) if train else max(1, y_extent // 150)
    for (a, b), color in zip(edges, colors):
        x = pose[[a, b], 0]
        y = pose[[a, b], 1]
        if 0 not in x:
            draw_edge(img, x, y, bw=bw, color=color, endpoints=True)

    if not basic_point_only:
        bw = rng.randrange(1, 3) if train else max(1, y_extent // 450)
        for hand in (hand_l, hand_r):
            for finger, color in zip(HAND_FINGERS, HAND_COLORS):
                for j in range(len(finger) - 1):
                    x = hand[[finger[j], finger[j + 1]], 0]
                    y = hand[[finger[j], finger[j + 1]], 1]
                    if 0 not in x:
                        draw_edge(img, x, y, bw=bw, color=color)

        if not remove_face_labels:
            bw = rng.randrange(1, 3) if train else max(1, y_extent // 450)
            for seg_list in FACE_SEGMENTS:
                for seg in seg_list:
                    for i in range(0, max(1, len(seg) - 1)):
                        sub = seg[i:i + 2]
                        x = face[np.asarray(sub), 0]
                        y = face[np.asarray(sub), 1]
                        if 0 not in x:
                            draw_edge(img, x, y, bw=bw)
    return img


def render_openpose(source, size, train: bool = False,
                    rng: Optional[_random.Random] = None,
                    basic_point_only: bool = False,
                    remove_face_labels: bool = False,
                    person_idx: Optional[int] = None):
    """JSON -> (label image, pose keypoints, face keypoints).

    Picks the person with the largest vertical pose extent, like the
    reference read_keypoints (utils/keypoint2img.py:50-57).
    """
    people = parse_openpose_json(source)
    if person_idx is not None:
        people = [people[person_idx]]
    w, h = size
    best_img = np.zeros((h, w, 3), np.uint8)
    best_pose = np.zeros((25, 3))
    best_face = np.zeros((70, 3))
    best_extent = 0.0
    for person in people:
        pose = valid_keypoints(person["pose"])
        face = valid_keypoints(person["face"])
        hand_l = valid_keypoints(person["hand_l"])
        hand_r = valid_keypoints(person["hand_r"])
        extent = pose[:, 1].max() - pose[:, 1].min()
        if extent > best_extent:
            best_extent = extent
            best_img = render_person(pose, face, hand_l, hand_r, size, train,
                                     rng, basic_point_only,
                                     remove_face_labels)
            best_pose, best_face = pose, face
    return best_img, best_pose, best_face
