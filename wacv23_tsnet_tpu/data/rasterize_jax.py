"""On-device (JAX) keypoint rasterizer.

The streaming-inference tier of the two-tier rasterizer split
(SURVEY.md §7 step 5): whole clips of validated keypoints rasterize into
label-class maps ON TPU, so a driving video streams end-to-end on device
(BASELINE.json north star — "keypoint2img moves from PIL/numpy into a
JAX preprocessing stage").

Formulation: every skeleton edge is a curve; a pixel takes the class
of the LAST edge (stamping order, like the CPU tier) that covers it.
Coverage is a closed-form model of the CPU tier's DISCRETE stamping —
dense (pixels x edges) VPU math that vectorizes over frames with
`vmap`, no scatter:

- the CPU tier samples each fitted curve at
  `linspace(t0, t1, ceil(t1 - t0))` along the longer axis, int-casts
  the samples, and stamps an asymmetric square brush [-bw, bw) at each
  (stamp_edge). Pixel p is covered by sample i iff
  floor(ts_i) in [p - bw + 1, p + bw] per axis, i.e. iff ts_i lands in
  the half-open window [p - bw + 1, p + bw + 1). Since ts_i is affine
  in i (and the minor coordinate linear or quadratic in i), "some
  sample covers p" becomes "an integer i exists in a closed-form
  interval set" — evaluated exactly per (pixel, edge), including the
  sparse-sample regime where `linspace` steps > 1 px and the brush
  union is a dotted line (the previous continuous Minkowski-sum model
  over-covered exactly there);
- pose edges add the reference's radius-2bw endpoint disks
  (stamp_edge endpoints=True), an exact integer-offset disk test around
  the int-cast curve ends, drawn only when the curve is non-empty;
- face-task edges group landmarks in threes (data/face.py edge_len=3),
  so their minor coordinate is the reference's QUADRATIC fit —
  reproduced via Lagrange interpolation, including the |a| > 1
  wild-quadratic rejection that drops the edge entirely.

Remaining documented divergences, bounded by tests/test_rasterize_jax
assertions: boundary pixels where the oracle's polyfit/linspace float
rounding lands a sample exactly on a window edge (<= 1 px, class-
preserving), and the CPU tier's border clamping (strokes pile up at
canvas edges instead of clipping). Training uses the CPU tier; this
tier serves high-throughput inference.
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


def _exists_int(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Does [lo, hi] (real bounds) contain an integer?"""
    return jnp.ceil(lo) <= jnp.floor(hi)


def _stamp_cover(pix: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                 bw: jnp.ndarray) -> jnp.ndarray:
    """Exact coverage of `interp_curve` + `stamp_edge` for 2-point edges.

    pix (P, 2) integer pixel coords; a/b (E, 2) endpoints; bw scalar or
    (E,) brush widths -> (P, E) bool.

    Models the CPU tier sample-for-sample: main axis = the larger
    |delta| axis, t sorted ascending, n = ceil(span) samples
    ts_i = t0 + i*dt with dt = span/(n-1), minor coordinate linear in i.
    Sample i covers pixel p iff both floored coordinates land in
    [p - bw + 1, p + bw]; coverage <=> an integer i in [0, n-1]
    satisfies two affine window conditions — solved in closed form.
    """
    ax, ay = a[None, :, 0], a[None, :, 1]                  # (1, E)
    bx, by = b[None, :, 0], b[None, :, 1]
    px = pix[:, 0:1]                                       # (P, 1)
    py = pix[:, 1:2]
    bw = jnp.broadcast_to(jnp.asarray(bw, jnp.float32), ax.shape)

    main_y = jnp.abs(bx - ax) < jnp.abs(by - ay)           # (1, E)
    am = jnp.where(main_y, ay, ax)
    an = jnp.where(main_y, ax, ay)
    bm = jnp.where(main_y, by, bx)
    bn = jnp.where(main_y, bx, by)
    pm = jnp.where(main_y, py, px)                         # (P, E)
    pn = jnp.where(main_y, px, py)

    swap = am > bm
    t0 = jnp.where(swap, bm, am)
    t1 = jnp.where(swap, am, bm)
    v0 = jnp.where(swap, bn, an)
    v1 = jnp.where(swap, an, bn)
    span = t1 - t0
    n = jnp.ceil(span)                                     # sample count

    # per-axis half-open windows (integer bounds: pixel and bw are ints)
    lo_w_m = pm - bw + 1.0
    hi_w_m = pm + bw + 1.0                                 # exclusive
    lo_w_n = pn - bw + 1.0
    hi_w_n = pn + bw + 1.0

    nm1 = jnp.maximum(n - 1.0, 1.0)
    dt = span / nm1
    dv = (v1 - v0) / nm1
    safe_dt = jnp.where(dt == 0, 1.0, dt)
    # main: ts_i in [lo_w_m, hi_w_m)  (dt > 0 whenever n >= 2)
    i_lo_m = jnp.ceil((lo_w_m - t0) / safe_dt)
    i_hi_m = jnp.ceil((hi_w_m - t0) / safe_dt) - 1.0
    # minor: v0 + i*dv in [lo_w_n, hi_w_n); sign of dv flips/opens bounds
    pos = dv > 0
    neg = dv < 0
    safe_dv = jnp.where(dv == 0, 1.0, dv)
    q_lo = (lo_w_n - v0) / safe_dv
    q_hi = (hi_w_n - v0) / safe_dv
    zero_ok = (v0 >= lo_w_n) & (v0 < hi_w_n)
    i_lo_n = jnp.where(pos, jnp.ceil(q_lo),
                       jnp.where(neg, jnp.floor(q_hi) + 1.0,   # exclusive
                                 jnp.where(zero_ok, 0.0, n)))
    i_hi_n = jnp.where(pos, jnp.ceil(q_hi) - 1.0,
                       jnp.where(neg, jnp.floor(q_lo),          # inclusive
                                 jnp.where(zero_ok, n - 1.0, -1.0)))
    ilo = jnp.maximum(jnp.maximum(i_lo_m, i_lo_n), 0.0)
    ihi = jnp.minimum(jnp.minimum(i_hi_m, i_hi_n), n - 1.0)
    cover_multi = ilo <= ihi

    # n == 1: the single sample sits at (t0, v0)
    cover_one = ((t0 >= lo_w_m) & (t0 < hi_w_m)
                 & (v0 >= lo_w_n) & (v0 < hi_w_n))
    return jnp.where(n >= 2.0, cover_multi,
                     jnp.where(n == 1.0, cover_one, False))


_INF = jnp.float32(np.inf)


def _stamp_cover_quad(pix: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray,
                      p2: jnp.ndarray, bw) -> jnp.ndarray:
    """Exact coverage for 3-point edges (the face-task edge_len=3 groups):
    minor coordinate QUADRATIC in the sample index, via the Lagrange
    parabola through the three points — the same curve as the oracle's
    least-squares fit (3 points, degree 2 => interpolation), including
    the |a| > 1 wild-quadratic rejection that drops the edge entirely
    (reference utils/keypoint2img.py:334 behavior).

    pix (P, 2); p0/p1/p2 (E, 2); bw scalar -> (P, E) bool.
    """
    xs = jnp.stack([p0[:, 0], p1[:, 0], p2[:, 0]])[:, None, :]  # (3, 1, E)
    ys = jnp.stack([p0[:, 1], p1[:, 1], p2[:, 1]])[:, None, :]
    px = pix[:, 0:1]
    py = pix[:, 1:2]
    bw = jnp.asarray(bw, jnp.float32)

    # axis choice: larger max-consecutive-diff (interp_curve)
    main_y = (jnp.maximum(jnp.abs(xs[1] - xs[0]), jnp.abs(xs[2] - xs[1]))
              < jnp.maximum(jnp.abs(ys[1] - ys[0]), jnp.abs(ys[2] - ys[1])))
    t = jnp.where(main_y, ys, xs)                           # (3, 1, E)
    v = jnp.where(main_y, xs, ys)
    pm = jnp.where(main_y, py, px)                          # (P, E)
    pn = jnp.where(main_y, px, py)
    flip = t[0] > t[2]
    ta, tb, tc = (jnp.where(flip, t[2], t[0]), t[1],
                  jnp.where(flip, t[0], t[2]))
    va, vb, vc = (jnp.where(flip, v[2], v[0]), v[1],
                  jnp.where(flip, v[0], v[2]))
    span = tc - ta
    n = jnp.ceil(span)

    # Lagrange coefficients of v(t) = alpha t^2 + beta t + gamma
    eps = 1e-6
    d0 = (ta - tb) * (ta - tc)
    d1 = (tb - ta) * (tb - tc)
    d2 = (tc - ta) * (tc - tb)
    degen = (jnp.abs(d0) < eps) | (jnp.abs(d1) < eps) | (jnp.abs(d2) < eps)
    sd0 = jnp.where(jnp.abs(d0) < eps, 1.0, d0)
    sd1 = jnp.where(jnp.abs(d1) < eps, 1.0, d1)
    sd2 = jnp.where(jnp.abs(d2) < eps, 1.0, d2)
    alpha = va / sd0 + vb / sd1 + vc / sd2
    beta = -(va * (tb + tc) / sd0 + vb * (ta + tc) / sd1
             + vc * (ta + tb) / sd2)
    gamma = (va * tb * tc / sd0 + vb * ta * tc / sd1 + vc * ta * tb / sd2)
    wild = jnp.abs(alpha) > 1.0                             # ref :334 reject

    nm1 = jnp.maximum(n - 1.0, 1.0)
    dt = span / nm1
    # v as a function of the sample index i (t = ta + i*dt)
    a2 = alpha * dt * dt
    a1 = (2.0 * alpha * ta + beta) * dt
    a0 = (alpha * ta + beta) * ta + gamma

    lo_w_m = pm - bw + 1.0
    hi_w_m = pm + bw + 1.0
    lo_w_n = pn - bw + 1.0
    hi_w_n = pn + bw + 1.0
    safe_dt = jnp.where(dt == 0, 1.0, dt)
    i_lo_m = jnp.maximum(jnp.ceil((lo_w_m - ta) / safe_dt), 0.0)
    i_hi_m = jnp.minimum(jnp.ceil((hi_w_m - ta) / safe_dt) - 1.0, n - 1.0)

    # ---- quadratic band {lo_w_n <= q(i) < hi_w_n} as <= 2 intervals ----
    lin = jnp.abs(a2) < 1e-9
    sa2 = jnp.where(lin, 1.0, a2)

    def roots(c):
        disc = a1 * a1 - 4.0 * sa2 * (a0 - c)
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (-a1 - s) / (2.0 * sa2)
        r2 = (-a1 + s) / (2.0 * sa2)
        return disc >= 0, jnp.minimum(r1, r2), jnp.maximum(r1, r2)

    okA, rA1, rA2 = roots(lo_w_n)
    okB, rB1, rB2 = roots(hi_w_n)
    posq = a2 > 0
    # A2 > 0: {q < B} = (rB1, rB2) [empty if !okB];
    #         {q >= A} = outside (rA1, rA2) [everything if !okA]
    pA1 = jnp.where(okA, rA1, _INF)
    pA2 = jnp.where(okA, rA2, _INF)
    pB1 = jnp.where(okB, rB1, _INF)
    pB2 = jnp.where(okB, rB2, -_INF)
    p_l1, p_h1 = pB1, jnp.minimum(pA1, pB2)
    p_l2, p_h2 = jnp.maximum(pA2, pB1), pB2
    # A2 < 0: {q < B} = (-inf, rB1) u (rB2, inf) [everything if !okB];
    #         {q >= A} = [rA1, rA2] [empty if !okA]
    nA1 = jnp.where(okA, rA1, _INF)
    nA2 = jnp.where(okA, rA2, -_INF)
    nB1 = jnp.where(okB, rB1, _INF)
    nB2 = jnp.where(okB, rB2, _INF)
    n_l1, n_h1 = nA1, jnp.minimum(nA2, nB1)
    n_l2, n_h2 = jnp.maximum(nB2, nA1), nA2
    l1 = jnp.where(posq, p_l1, n_l1)
    h1 = jnp.where(posq, p_h1, n_h1)
    l2 = jnp.where(posq, p_l2, n_l2)
    h2 = jnp.where(posq, p_h2, n_h2)
    # linear fallback (a2 ~ 0): one interval from the affine condition
    posl = a1 > 0
    negl = a1 < 0
    sa1 = jnp.where(a1 == 0, 1.0, a1)
    q_lo = (lo_w_n - a0) / sa1
    q_hi = (hi_w_n - a0) / sa1
    zero_ok = (a0 >= lo_w_n) & (a0 < hi_w_n)
    lin_lo = jnp.where(posl, q_lo, jnp.where(negl, q_hi,
                       jnp.where(zero_ok, 0.0, _INF)))
    lin_hi = jnp.where(posl, q_hi, jnp.where(negl, q_lo,
                       jnp.where(zero_ok, n - 1.0, -_INF)))
    l1 = jnp.where(lin, lin_lo, l1)
    h1 = jnp.where(lin, lin_hi, h1)
    l2 = jnp.where(lin, _INF, l2)
    h2 = jnp.where(lin, -_INF, h2)

    cov = (_exists_int(jnp.maximum(l1, i_lo_m), jnp.minimum(h1, i_hi_m))
           | _exists_int(jnp.maximum(l2, i_lo_m), jnp.minimum(h2, i_hi_m)))
    cover_one = ((ta >= lo_w_m) & (ta < hi_w_m)
                 & (a0 >= lo_w_n) & (a0 < hi_w_n))
    cov = jnp.where(n >= 2.0, cov, jnp.where(n == 1.0, cover_one, False))
    return cov & jnp.logical_not(wild) & jnp.logical_not(degen)


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
        # the CPU tier tests `if 0 not in x` — x coords only
        # (data/rasterize.py render_person)
        valid = (a[:, 0] != 0) & (b[:, 0] != 0)
        bw = jnp.where(group == 0, pbw, hbw).astype(jnp.float32)

        # stroke body: exact discrete square-brush stamping
        hit = _stamp_cover(pix, a, b, bw[None])
        # pose edges also stamp radius-2bw endpoint disks
        # (stamp_edge endpoints=True): exact integer-offset disks around
        # the int-cast endpoints — drawn only when the sampled curve is
        # non-empty (stamp_edge early-returns on len 0, skipping dots)
        nonempty = (jnp.maximum(jnp.abs(b[:, 0] - a[:, 0]),
                                jnp.abs(b[:, 1] - a[:, 1])) > 0.0)[None]
        af = jnp.floor(a)
        bf = jnp.floor(b)
        d2a = jnp.sum((pix[:, None, :] - af[None]) ** 2, axis=-1)
        d2b = jnp.sum((pix[:, None, :] - bf[None]) ** 2, axis=-1)
        dots = ((jnp.minimum(d2a, d2b) < 4.0 * bw[None] ** 2)
                & (group == 0) & nonempty)
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

    Reproduces `data/face.py render_face_edges` exactly: landmarks group
    into edge_len=3 windows with stride 2 — 3-point groups draw the
    reference's QUADRATIC curve fit (`_stamp_cover_quad`, incl. the
    wild-quadratic rejection), 2-point tails draw linear strokes.
    """
    from .face import FACE_PART_LIST

    tris, pairs = [], []
    edge_len = 3
    for part in FACE_PART_LIST:
        for edge in part:
            for i in range(0, max(1, len(edge) - 1), edge_len - 1):
                sub = edge[i:i + edge_len]
                if len(sub) == 3:
                    tris.append(tuple(sub))
                elif len(sub) == 2:
                    pairs.append(tuple(sub))
    tris = np.asarray(tris, np.int32)
    pairs = np.asarray(pairs, np.int32)
    t0i, t1i, t2i = (jnp.asarray(tris[:, j]) for j in range(3))
    si = jnp.asarray(pairs[:, 0])
    ei = jnp.asarray(pairs[:, 1])

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx, gy], -1).reshape(-1, 2)

    def one(kp, bw_f):
        hit_q = _stamp_cover_quad(pix, kp[t0i], kp[t1i], kp[t2i], bw_f)
        hit_l = _stamp_cover(pix, kp[si], kp[ei], bw_f)
        hit = jnp.any(hit_q, axis=1) | jnp.any(hit_l, axis=1)
        return hit.reshape(h, w).astype(jnp.int32)

    return jax.vmap(one)(keypoints.astype(jnp.float32),
                         bw.astype(jnp.float32))
