"""Native C++ rasterizer: build + exact parity with the numpy tier."""

import numpy as np
import pytest

from wacv23_tsnet_tpu.native import available, native_draw_edge
from wacv23_tsnet_tpu.data.rasterize import interp_curve, stamp_edge

RNG = np.random.default_rng(21)

pytestmark = pytest.mark.skipif(not available(),
                                reason="no native toolchain")


def numpy_draw(img, x, y, bw, color, endpoints):
    cx, cy = interp_curve(x, y)
    stamp_edge(img, cx, cy, bw=bw, color=color, endpoints=endpoints)


@pytest.mark.parametrize("npts", [2, 3])
@pytest.mark.parametrize("endpoints", [False, True])
def test_native_draw_edge_matches_numpy(npts, endpoints):
    mismatches = 0
    for trial in range(40):
        x = RNG.uniform(5, 120, npts)
        y = RNG.uniform(5, 120, npts)
        want = np.zeros((128, 128, 3), np.uint8)
        got = np.zeros((128, 128, 3), np.uint8)
        numpy_draw(want, x, y, bw=2, color=(10, 200, 30),
                   endpoints=endpoints)
        ok = native_draw_edge(got, x, y, 2, (10, 200, 30), endpoints)
        assert ok
        if not np.array_equal(got, want):
            # int-cast ties at float boundaries may differ by single
            # pixels along the stroke; require near-identical strokes
            diff = (got != want).any(axis=-1).sum()
            total = (want != 0).any(axis=-1).sum()
            assert diff <= max(8, 0.05 * total), (trial, diff, total)
            mismatches += 1
    assert mismatches <= 8


def test_native_grayscale_and_degenerate():
    img = np.zeros((64, 64), np.uint8)
    assert native_draw_edge(img, [10, 50], [20, 20], 1, (255,), False)
    want = np.zeros((64, 64), np.uint8)
    numpy_draw(want, np.array([10.0, 50.0]), np.array([20.0, 20.0]), 1,
               (255,), False)
    np.testing.assert_array_equal(img, want)

    # duplicate points: degenerate fit, nothing drawn — same as numpy
    img2 = np.zeros((64, 64), np.uint8)
    native_draw_edge(img2, [10, 10], [20, 20], 1, (255,), False)
    assert img2.sum() == 0


def test_full_person_render_uses_native_and_matches():
    """render_person output is identical whichever tier draws it."""
    import os
    from wacv23_tsnet_tpu.data import rasterize as ras

    ref_dir = "/root/reference/demo/dance_example/labels/00110"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference mount not present")
    jf = sorted(os.listdir(ref_dir))[0]
    p = ras.parse_openpose_json(os.path.join(ref_dir, jf))[0]
    pose = ras.valid_keypoints(p["pose"])
    face = ras.valid_keypoints(p["face"])
    hl = ras.valid_keypoints(p["hand_l"])
    hr = ras.valid_keypoints(p["hand_r"])

    native_img = ras.render_person(pose, face, hl, hr, (1920, 1080),
                                   train=False)
    os.environ["TSNET_NATIVE"] = "0"
    try:
        import wacv23_tsnet_tpu.native.build as nb
        old_lib, old_tried = nb._LIB, nb._TRIED
        nb._LIB, nb._TRIED = None, True
        numpy_img = ras.render_person(pose, face, hl, hr, (1920, 1080),
                                      train=False)
    finally:
        nb._LIB, nb._TRIED = old_lib, old_tried
        os.environ.pop("TSNET_NATIVE", None)

    agreement = (native_img == numpy_img).mean()
    assert agreement > 0.9999, agreement
