"""Streaming session: matches clip inference; keypoint path runs on device."""

import numpy as np
import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.infer.streaming import RetargetSession
from wacv23_tsnet_tpu.models import TSNetModules, tsnet_forward_clip

RNG = np.random.default_rng(41)


def _inputs(cfg, frames=7):
    s, hw, l = cfg.n_source, cfg.image_size, cfg.label_nc
    return (
        RNG.random((s, hw, hw, 3)).astype(np.float32),
        RNG.integers(0, 2, (s, hw, hw, l)).astype(np.float32),
        RNG.integers(0, 2, (s, hw, hw)).astype(np.float32),
        RNG.integers(0, 2, (frames, hw, hw, l)).astype(np.float32),
        RNG.integers(0, 2, (frames, hw, hw)).astype(np.float32),
    )


def test_session_matches_clip_forward():
    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    src_img, src_lbl, src_bbox, tar_lbl, tar_bbox = _inputs(cfg)

    want = np.asarray(jax.jit(
        lambda p, *a: tsnet_forward_clip(mods, p, *a, use_pallas=False)
    )(params, jnp.asarray(src_img), jnp.asarray(src_lbl),
      jnp.asarray(src_bbox), jnp.asarray(tar_lbl), jnp.asarray(tar_bbox)))

    session = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                              chunk=4, use_pallas=False)
    got = session.push_labels(tar_lbl, tar_bbox)   # 7 frames over 4-chunks
    # separate jit programs fuse differently -> small float noise
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_session_pose_keypoint_path_on_device():
    import dataclasses
    cfg = dataclasses.replace(toy_config(), task="pose", label_nc=25,
                              use_fg_mask=True, use_align_loss=False)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    hw, s, l = cfg.image_size, cfg.n_source, cfg.label_nc
    session = RetargetSession(
        cfg, params,
        RNG.random((s, hw, hw, 3)).astype(np.float32),
        RNG.integers(0, 2, (s, hw, hw, l)).astype(np.float32),
        RNG.integers(0, 2, (s, hw, hw)).astype(np.float32),
        chunk=4, use_pallas=False)
    kp = RNG.uniform(hw * 0.2, hw * 0.8, (3, 137, 2)).astype(np.float32)
    kp[:, 40:60] = 0.0   # some undetected points
    frames = session.push_keypoints(kp)
    assert frames.shape == (3, hw, hw, 3)
    assert np.isfinite(frames).all()


def test_session_keypoint_path_on_device():
    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    src_img, src_lbl, src_bbox, _, _ = _inputs(cfg)
    session = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                              chunk=4, use_pallas=False)

    hw = cfg.image_size
    kp = RNG.uniform(hw * 0.2, hw * 0.8, (5, 68, 2)).astype(np.float32)
    frames = session.push_keypoints(kp)
    assert frames.shape == (5, hw, hw, 3)
    assert np.isfinite(frames).all()
    assert np.abs(frames).max() <= 1.0


def test_session_uint8_wire_formats_match_model_space():
    """The serving wire formats — uint8 class-map labels IN, uint8
    display frames OUT — produce the same frames as the f32 model-space
    path plus host-side conversion, to within one quantization step.
    These formats exist because the round-5 serve bench measured the
    f32 path tunnel-bandwidth-bound (~20-25 fps flat across chunks)."""
    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    src_img, src_lbl, src_bbox, tar_lbl, tar_bbox = _inputs(cfg)

    # a genuine class map (the _inputs labels are random multi-hot,
    # which no class map can express)
    f, hw, l = tar_lbl.shape[0], cfg.image_size, cfg.label_nc
    cls_map = RNG.integers(0, l, (f, hw, hw)).astype(np.uint8)
    onehot = np.eye(l, dtype=np.float32)[cls_map]

    base = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                           chunk=4, use_pallas=False)
    rec = base.push_labels(onehot, tar_bbox)
    mean = cfg.img_mean_array()
    want_u8 = np.clip(np.round(rec * 255.0 + mean), 0, 255).astype(np.uint8)

    disp = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                           chunk=4, use_pallas=False, output="display")
    # class-map uint8 labels + uint8 bboxes on the wire
    got = disp.push_labels(cls_map, tar_bbox.astype(np.uint8))
    assert got.dtype == np.uint8 and got.shape == rec.shape
    # device vs host rounding may differ by 1 LSB
    assert np.abs(got.astype(np.int32) - want_u8.astype(np.int32)).max() <= 1

    # keypoint path honors the display format too
    hw = cfg.image_size
    kp = RNG.uniform(hw * 0.2, hw * 0.8, (5, 68, 2)).astype(np.float32)
    frames = disp.push_keypoints(kp)
    assert frames.dtype == np.uint8 and frames.shape == (5, hw, hw, 3)
