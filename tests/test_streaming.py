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
