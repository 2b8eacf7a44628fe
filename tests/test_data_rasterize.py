"""Data-layer parity vs the reference implementation as a live oracle.

The reference's rasterizer/smoother/posenorm modules are pure
numpy/scipy/PIL and import cleanly from the read-only mount, so these
tests compare our fresh implementations against the original behavior
on the bundled demo assets. (The reference dataset classes themselves
import skimage, which this environment lacks — their logic is covered
by the invariant tests instead.)
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
needs_reference = pytest.mark.skipif(not os.path.isdir(REF),
                                     reason="reference mount not present")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from wacv23_tsnet_tpu.data import rasterize as ras           # noqa: E402
from wacv23_tsnet_tpu.data import smoothing                  # noqa: E402
from wacv23_tsnet_tpu.data.posenorm import retarget_pose, shift_pts  # noqa: E402

RNG = np.random.default_rng(3)

DEMO_POSE_JSON = os.path.join(
    REF, "demo/dance_example/labels/00110")
DEMO_FACE_LABELS = os.path.join(
    REF, "demo/face_examples/labels/val024")


@needs_reference
def test_interp_curve_matches_reference():
    from utils.keypoint2img import interp_points

    agree = total = 0
    for _ in range(60):
        n = RNG.integers(2, 4)
        x = RNG.uniform(0, 200, n)
        y = RNG.uniform(0, 200, n)
        want = interp_points(x.copy(), y.copy())
        got = ras.interp_curve(x, y)
        if want[0] is None or got[0] is None:
            assert want[0] is None and got[0] is None
            continue
        assert len(want[0]) == len(got[0])
        if len(want[0]) == 0:
            continue
        # identical least-squares fit, so at most off-by-one from the
        # float->int cast at ties
        assert np.abs(want[0] - got[0]).max() <= 1
        assert np.abs(want[1] - got[1]).max() <= 1
        agree += int(np.array_equal(want[0], got[0])
                     and np.array_equal(want[1], got[1]))
        total += 1
    assert agree / total > 0.9


@needs_reference
def test_stamp_edge_matches_reference_draw_edge():
    from utils.keypoint2img import draw_edge

    for endpoints in (False, True):
        want = np.zeros((64, 64, 3), np.uint8)
        got = np.zeros((64, 64, 3), np.uint8)
        xs = RNG.integers(-5, 70, 25)
        ys = RNG.integers(-5, 70, 25)
        draw_edge(want, xs.copy(), ys.copy(), bw=2, color=(10, 20, 30),
                  draw_end_points=endpoints)
        ras.stamp_edge(got, xs, ys, bw=2, color=(10, 20, 30),
                       endpoints=endpoints)
        np.testing.assert_array_equal(got, want)


@needs_reference
def test_valid_keypoints_matches_reference():
    from utils.keypoint2img import define_edge_lists, extract_valid_keypoints

    edge_lists = define_edge_lists(False)
    json_files = sorted(os.listdir(DEMO_POSE_JSON))[:5]
    for jf in json_files:
        people = ras.parse_openpose_json(os.path.join(DEMO_POSE_JSON, jf))
        for person in people:
            for key, pts in person.items():
                want = extract_valid_keypoints(pts.copy(), edge_lists)
                got = ras.valid_keypoints(pts)
                np.testing.assert_allclose(got, want)


@needs_reference
def test_render_openpose_matches_reference_test_mode():
    """Pixel-level agreement of full-person rasterization (test-time
    deterministic brush widths)."""
    from utils.keypoint2img import read_keypoints

    class Opt:
        isTrain = False
        remove_face_labels = False

    read_keypoints.face_ratio = None
    json_files = sorted(os.listdir(DEMO_POSE_JSON))[:3]
    for jf in json_files:
        path = os.path.join(DEMO_POSE_JSON, jf)
        want_img, want_pose, _ = read_keypoints(Opt(), path, (512, 512))
        got_img, got_pose, _ = ras.render_openpose(path, (512, 512),
                                                   train=False)
        np.testing.assert_allclose(got_pose, want_pose)
        # identical up to off-by-one curve casts: require >99% agreement
        agreement = (got_img == want_img).mean()
        assert agreement > 0.99, f"agreement {agreement} for {jf}"


@needs_reference
def test_smoothing_matches_reference_smooth_points():
    import json as _json
    sys.modules.setdefault("json_tricks", _json)  # absent dep, json-compatible
    from dataset.smooth_pose_keypoint import smooth_points

    track = RNG.uniform(1, 100, (30, 25, 2))
    # knock out some detections
    mask = RNG.random((30, 25)) < 0.2
    track[mask] = 0.0
    want = smooth_points(track.copy())
    got = smoothing.smooth_valid_track(track)
    np.testing.assert_allclose(got, want)


@needs_reference
def test_retarget_pose_matches_reference_read_pts_posenorm():
    from utils.keypoint2img_posenorm import read_pts_posenorm

    class Opt:
        isTrain = False
        remove_face_labels = False
        basic_point_only = False

    from wacv23_tsnet_tpu.data.smoothing import load_json_tricks
    smooth = load_json_tricks(os.path.join(
        REF, "dataset/json_pose/smooth_openpose", "00164.json"))

    h = w = 512
    for mode in ("fm", "mf"):
        for idx in (0, 3):
            pts_ref = [
                np.asarray(smooth["pose_keypoints_2d"][idx], float),
                np.asarray(smooth["face_keypoints_2d"][idx], float),
                np.asarray(smooth["hand_left_keypoints_2d"][idx], float),
                np.asarray(smooth["hand_right_keypoints_2d"][idx], float),
            ]
            crop = (10, 20, 10 + w, 20 + h)
            _, _, want_pts = read_pts_posenorm(
                Opt(), [p.copy() for p in pts_ref], crop, (w, h),
                ref_pts_length=mode)

            mine = shift_pts({
                "pose": pts_ref[0], "face": pts_ref[1],
                "hand_l": pts_ref[2], "hand_r": pts_ref[3],
            }, (crop[0], crop[1]))
            got = retarget_pose(mine, image_h=h, mode=mode)
            np.testing.assert_allclose(got["pose"], want_pts[0], atol=1e-6)
            np.testing.assert_allclose(got["hand_l"], want_pts[2], atol=1e-6)
            np.testing.assert_allclose(got["hand_r"], want_pts[3], atol=1e-6)


@needs_reference
def test_smooth_keypoints_cli_reproduces_shipped_files():
    """The offline smoother reproduces the reference's committed
    smooth_openpose/00164.json bit-exactly."""
    import json

    from wacv23_tsnet_tpu.cli.smooth_keypoints import smooth_video
    from wacv23_tsnet_tpu.data.smoothing import load_json_tricks

    with open(os.path.join(
            REF, "dataset/json_pose/clean_unseen_video_dict.json")) as f:
        frames = json.load(f)["164"]
    mine = smooth_video(os.path.join(REF, "demo/dance_example/labels/00164"),
                        frames, 30)
    shipped = load_json_tricks(os.path.join(
        REF, "dataset/json_pose/smooth_openpose/00164.json"))
    for key in ("pose_keypoints_2d", "face_keypoints_2d",
                "hand_left_keypoints_2d", "hand_right_keypoints_2d"):
        np.testing.assert_array_equal(
            np.asarray(mine[key]["__ndarray__"]), np.asarray(shipped[key]))


def test_face_retarget_identity_invariance():
    """Retargeting a clip onto its own statistics is ~identity."""
    from wacv23_tsnet_tpu.data.face import FaceRetargeter

    frames = [RNG.uniform(10, 200, (68, 2)) + i for i in range(4)]
    r = FaceRetargeter()
    r.fit_reference(frames)
    out = r.retarget([f.copy() for f in frames])
    for a, b in zip(out, frames):
        np.testing.assert_allclose(a, b, atol=1e-6)


@needs_reference
def test_face_dataset_runs_on_demo_assets():
    from wacv23_tsnet_tpu.data.datasets import FaceDatasetTest

    ds = FaceDatasetTest(
        sub_images_path=os.path.join(REF, "demo/face_examples/images/val024"),
        sub_labels_path=os.path.join(REF, "demo/face_examples/labels/val024"),
        dri_images_path=os.path.join(REF, "demo/face_examples/images/test114"),
        dri_labels_path=os.path.join(REF, "demo/face_examples/labels/test114"),
        max_frame_num=6,
    )
    s = ds[0]
    for part in ("src", "tar"):
        d = s[part]
        assert d["img"].shape[1:] == (3, 256, 256)
        assert d["lbl"].shape[1:] == (256, 256)
        assert d["bbox"].shape[1:] == (256, 256)
        assert set(np.unique(d["lbl"])) <= {0, 1}
        assert d["lbl"].sum() > 0, "no face edges rasterized"
        assert d["bbox"].sum() > 0


@needs_reference
def test_pose_dataset_runs_on_demo_assets():
    from wacv23_tsnet_tpu.data.datasets import PoseDatasetTest

    ds = PoseDatasetTest(
        test_pairs=["110 164"],
        sub_json_path=os.path.join(REF, "dataset/json_pose/clean_video_dict.json"),
        msk_json_path=os.path.join(
            REF, "dataset/json_pose/clean_unseen_video_dict.json"),
        label_path=os.path.join(REF, "demo/dance_example/labels"),
        smooth_label_path=os.path.join(
            REF, "dataset/json_pose/smooth_openpose"),
        image_path=os.path.join(REF, "demo/dance_example/images"),
        n_frame_total=4,
    )
    s = ds[0]
    assert s["diff_sex"] in ("", "fm", "mf")
    for part in ("src", "tar"):
        d = s[part]
        assert d["img"].shape[1:] == (3, 256, 256)
        assert d["lbl"].max() <= 24
        assert d["lbl"].sum() > 0, "no pose labels rasterized"
