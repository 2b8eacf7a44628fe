"""On-device (JAX) keypoint rasterizer.

The streaming-inference tier of the two-tier rasterizer split
(SURVEY.md §7 step 5): whole clips of validated keypoints rasterize into
label-class maps ON TPU, so a driving video streams end-to-end on device
(BASELINE.json north star — "keypoint2img moves from PIL/numpy into a
JAX preprocessing stage").

Formulation: every skeleton edge is a segment; a pixel takes the class
of the LAST edge (stamping order, like the CPU tier) whose point-to-
segment distance is within that edge's brush radius. That is a dense
(pixels x edges) distance computation — pure VPU work that vectorizes
over frames with `vmap`, no scatter.

Documented divergence from the CPU oracle tier (`rasterize.py`): limbs
are straight segments with a round brush instead of quadratic
least-squares curves with a square brush. Strokes differ by a pixel or
two of curvature; the label SEMANTICS (class ids, topology, widths,
order) are identical. Training uses the CPU tier; this tier serves
high-throughput inference.
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

        ab = b - a                                         # (E, 2)
        ab_len2 = jnp.maximum(jnp.sum(ab * ab, axis=1), 1e-8)
        ap = pix[:, None, :] - a[None, :, :]               # (P, E, 2)
        t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / ab_len2, 0.0, 1.0)
        closest = a[None] + t[..., None] * ab[None]        # (P, E, 2)
        d2 = jnp.sum((pix[:, None, :] - closest) ** 2, axis=-1)
        hit = (d2 <= bw[None] ** 2) & valid[None]          # (P, E)

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
        ab = b - a
        ab_len2 = jnp.maximum(jnp.sum(ab * ab, axis=1), 1e-8)
        ap = pix[:, None, :] - a[None, :, :]
        t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / ab_len2, 0.0, 1.0)
        closest = a[None] + t[..., None] * ab[None]
        d2 = jnp.sum((pix[:, None, :] - closest) ** 2, axis=-1)
        return jnp.any(d2 <= bw_f ** 2, axis=1).reshape(h, w).astype(jnp.int32)

    return jax.vmap(one)(keypoints.astype(jnp.float32),
                         bw.astype(jnp.float32))
