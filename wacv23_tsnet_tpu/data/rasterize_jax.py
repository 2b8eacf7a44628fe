"""On-device (JAX) keypoint rasterizer.

The streaming-inference tier of the two-tier rasterizer split
(SURVEY.md §7 step 5): whole clips of validated keypoints rasterize into
label-class maps ON TPU, so a driving video streams end-to-end on device
(BASELINE.json north star — "keypoint2img moves from PIL/numpy into a
JAX preprocessing stage").

Formulation: every skeleton edge is a segment; a pixel takes the class
of the LAST edge (stamping order, like the CPU tier) that covers it.
Coverage reproduces the CPU tier's stroke geometry as a dense
(pixels x edges) distance computation — pure VPU work that vectorizes
over frames with `vmap`, no scatter:

- the CPU tier stamps an asymmetric square brush [-bw, bw) at unit-step
  int-cast samples along each edge (stamp_edge); the union of those
  squares is the Minkowski sum segment (+) square, tested here exactly
  as "L-inf distance from (pixel + 0.5) to the segment <= bw - 0.5"
  (the +0.5 models the int cast's floor in expectation);
- pose edges add the reference's radius-2bw endpoint disks
  (stamp_edge endpoints=True), tested as an exact integer disk;
- every shipped edge is a 2-point pair, so the CPU tier's "quadratic
  curve fit" degenerates to a straight line — segments are NOT an
  approximation (data/rasterize.py render_person draws pairwise).

Remaining documented divergences, bounded by tests/test_rasterize_jax
per-class IoU assertions: the int cast of sample positions (<= half a
pixel of stroke shift) and the CPU tier's border clamping (strokes pile
up at canvas edges instead of clipping). Training uses the CPU tier;
this tier serves high-throughput inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rasterize import (FACE_SEGMENTS, HAND_FINGERS, pose_edge_colors)

def _build_edge_table(basic_point_only: bool = False,
                      remove_face_labels: bool = False):
    """Static (starts_idx, ends_idx, group, class_id) tables.

    group: 0 = pose, 1 = hand, 2 = face (selects the brush width).
    Point indexing: pose points 0..24, face 25..94, hand_l 95..115,
    hand_r 116..136 in one concatenated (137, 2) array per frame.
    """
    from .codecs import POSE_PALETTE

    palette = {tuple(c): i + 1 for i, c in enumerate(POSE_PALETTE.tolist())}
    edges = []
    pose_edges, pose_colors = pose_edge_colors(basic_point_only)
    for (a, b), color in zip(pose_edges, pose_colors):
        edges.append((a, b, 0, palette[tuple(color)]))
    if not basic_point_only:
        for hand_base, _ in ((95, "l"), (116, "r")):
            for fi, finger in enumerate(HAND_FINGERS):
                cls = palette[tuple(
                    POSE_PALETTE[18 + fi].tolist())]
                for j in range(len(finger) - 1):
                    edges.append((hand_base + finger[j],
                                  hand_base + finger[j + 1], 1, cls))
        if not remove_face_labels:
            for seg_list in FACE_SEGMENTS:
                for seg in seg_list:
                    for i in range(len(seg) - 1):
                        edges.append((25 + seg[i], 25 + seg[i + 1], 2, 24))
    arr = np.asarray(edges, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]


def _linf_seg_dist(pix: jnp.ndarray, a: jnp.ndarray,
                   b: jnp.ndarray) -> jnp.ndarray:
    """min over the segment [a, b] of max(|dx|, |dy|) from (pix + 1).

    pix (P, 2), a/b (E, 2) -> (P, E). The CPU tier stamps the square
    [floor(s)-bw, floor(s)+bw-1]^2 at unit-step samples s along the
    edge; pixel p is covered iff some s lies in the box
    [p-bw+1, p+bw+1)^2 — i.e. iff the L-inf distance from (p+1) to the
    segment is < bw. The distance is exact: it is piecewise linear in
    the segment parameter t, so its minimum is at an endpoint, a
    per-axis zero, or an |dx| == |dy| crossing — six candidates
    evaluated in closed form.
    """
    u = (pix[:, None, :] + 1.0) - a[None, :, :]            # (P, E, 2)
    v = (b - a)[None]                                      # (1, E, 2)

    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)

    cands = jnp.stack([
        jnp.zeros_like(u[..., 0]),
        jnp.ones_like(u[..., 0]),
        safe_div(u[..., 0], v[..., 0]),
        safe_div(u[..., 1], v[..., 1]),
        safe_div(u[..., 0] - u[..., 1], v[..., 0] - v[..., 1]),
        safe_div(u[..., 0] + u[..., 1], v[..., 0] + v[..., 1]),
    ], axis=-1)                                            # (P, E, 6)
    t = jnp.clip(cands, 0.0, 1.0)
    dx = jnp.abs(u[..., 0:1] - t * v[..., 0:1])
    dy = jnp.abs(u[..., 1:2] - t * v[..., 1:2])
    return jnp.min(jnp.maximum(dx, dy), axis=-1)           # (P, E)


@functools.partial(jax.jit, static_argnames=("h", "w", "basic_point_only",
                                             "remove_face_labels"))
def rasterize_pose_clip(pose: jnp.ndarray, face: jnp.ndarray,
                        hand_l: jnp.ndarray, hand_r: jnp.ndarray,
                        pose_bw: jnp.ndarray, hand_bw: jnp.ndarray,
                        h: int = 256, w: int = 256,
                        basic_point_only: bool = False,
                        remove_face_labels: bool = False) -> jnp.ndarray:
    """Rasterize a clip of validated keypoints to class maps.

    Args:
      pose: (F, 25, 2) xy; zeros mean undetected. face: (F, 70, 2);
      hand_l/hand_r: (F, 21, 2). pose_bw/hand_bw: (F,) brush widths
      (face uses hand_bw, like the reference's shared test-time width).

    Returns (F, h, w) int32 class maps (0 background, 1..24 palette).
    """
    starts_i, ends_i, group, class_id = _build_edge_table(
        basic_point_only, remove_face_labels)
    starts_i = jnp.asarray(starts_i)
    ends_i = jnp.asarray(ends_i)
    group = jnp.asarray(group)
    class_id = jnp.asarray(class_id)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")          # (h, w)
    pix = jnp.stack([gx, gy], -1).reshape(-1, 2)          # (P, 2)

    def one_frame(pose_f, face_f, hl_f, hr_f, pbw, hbw):
        pts = jnp.concatenate([pose_f, face_f, hl_f, hr_f], axis=0)
        a = pts[starts_i]                                  # (E, 2)
        b = pts[ends_i]
        valid = (jnp.all(a != 0, axis=1) & jnp.all(b != 0, axis=1))
        bw = jnp.where(group == 0, pbw, hbw).astype(jnp.float32)

        # stroke body: square-brush Minkowski sum (see _linf_seg_dist)
        hit = _linf_seg_dist(pix, a, b) < bw[None]
        # pose edges also stamp radius-2bw endpoint disks
        # (stamp_edge endpoints=True): exact integer-offset disks around
        # the int-cast endpoints
        af = jnp.floor(a)
        bf = jnp.floor(b)
        d2a = jnp.sum((pix[:, None, :] - af[None]) ** 2, axis=-1)
        d2b = jnp.sum((pix[:, None, :] - bf[None]) ** 2, axis=-1)
        dots = (jnp.minimum(d2a, d2b) < 4.0 * bw[None] ** 2) & (group == 0)
        hit = (hit | dots) & valid[None]                   # (P, E)

        # stamping order: the LAST hitting edge wins
        order = jnp.arange(hit.shape[1], dtype=jnp.int32)
        best = jnp.max(jnp.where(hit, order, -1), axis=1)  # (P,)
        cls = jnp.where(best >= 0, class_id[jnp.maximum(best, 0)], 0)
        return cls.reshape(h, w)

    return jax.vmap(one_frame)(pose, face, hand_l, hand_r,
                               pose_bw, hand_bw)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def rasterize_face_clip(keypoints: jnp.ndarray, bw: jnp.ndarray,
                        h: int = 256, w: int = 256) -> jnp.ndarray:
    """68-landmark clip -> (F, h, w) binary edge maps on device.

    Straight-segment approximation of the face part edges
    (data/face.py FACE_PART_LIST at edge_len=3 -> consecutive pairs).
    """
    from .face import FACE_PART_LIST

    pairs = []
    for part in FACE_PART_LIST:
        for edge in part:
            for i in range(len(edge) - 1):
                pairs.append((edge[i], edge[i + 1]))
    pairs = np.asarray(pairs, np.int32)
    si = jnp.asarray(pairs[:, 0])
    ei = jnp.asarray(pairs[:, 1])

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx, gy], -1).reshape(-1, 2)

    def one(kp, bw_f):
        a = kp[si]
        b = kp[ei]
        hit = _linf_seg_dist(pix, a, b) < bw_f
        return jnp.any(hit, axis=1).reshape(h, w).astype(jnp.int32)

    return jax.vmap(one)(keypoints.astype(jnp.float32),
                         bw.astype(jnp.float32))
