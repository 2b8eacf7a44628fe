"""Streaming retargeting sessions — the serving-shaped API.

A `RetargetSession` is a per-subject serving unit: the reference frames
are encoded ONCE and their feature pack stays device-resident; callers
then stream driving inputs in fixed-size chunks and receive synthesized
frames. Two input levels:

- `push_labels(tar_lbl, tar_bbox)`: pre-rasterized label maps;
- `push_keypoints(...)`: RAW keypoints — rasterization, one-hot
  expansion, and bbox derivation all happen ON DEVICE
  (data.rasterize_jax), completing the north-star path where a driving
  clip streams end-to-end on the TPU with only keypoints crossing the
  host boundary.

Fixed chunk sizes mean exactly one compiled program per session shape;
short final chunks are padded by wrapping and trimmed after.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import TSNetConfig
from ..models.tsnet import (TSNetModules, decode_with_sources,
                            encode_sources)


class RetargetSession:
    def __init__(self, cfg: TSNetConfig, params, src_img, src_lbl, src_bbox,
                 chunk: int = 32, use_pallas: bool = True):
        """Args are NHWC device-ready arrays: src_img (S, H, W, 3) in
        model space, src_lbl (S, H, W, L) one-hot, src_bbox (S, H, W)."""
        self.cfg = cfg
        self.mods = TSNetModules(cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        self.chunk = chunk
        self._encode = jax.jit(functools.partial(encode_sources, self.mods))
        self._decode = jax.jit(functools.partial(
            decode_with_sources, self.mods, use_pallas=use_pallas))
        self.src_pack = self._encode(self.params, jnp.asarray(src_img),
                                     jnp.asarray(src_lbl),
                                     jnp.asarray(src_bbox))
        self._decode_kp = None

    # ------------------------------------------------------------------
    def push_labels(self, tar_lbl, tar_bbox) -> np.ndarray:
        """(F, H, W, L) one-hot labels + (F, H, W) bboxes -> (F, H, W, 3)."""
        tar_lbl = jnp.asarray(tar_lbl)
        tar_bbox = jnp.asarray(tar_bbox)
        f = tar_lbl.shape[0]
        outs = []
        for lo in range(0, f, self.chunk):
            idx = np.arange(lo, lo + self.chunk) % f
            rec = self._decode(self.params, self.src_pack, tar_lbl[idx],
                               tar_bbox[idx])
            outs.append(np.asarray(rec[: min(self.chunk, f - lo)]))
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------------
    @staticmethod
    def _extent_bbox(xs, ys, hw: int):
        """Extent + 1/16-margin bbox masks for a batch of keypoint sets
        (data.face.face_bbox_mask / the pose label-extent rule)."""
        margin = hw // 16
        x_min = jnp.clip(jnp.min(xs, axis=1) - margin, 0, hw)
        x_max = jnp.clip(jnp.max(xs, axis=1) + margin, 0, hw)
        y_min = jnp.clip(jnp.min(ys, axis=1) - margin, 0, hw)
        y_max = jnp.clip(jnp.max(ys, axis=1) + margin, 0, hw)
        cols = jnp.arange(hw, dtype=jnp.float32)
        rows = jnp.arange(hw, dtype=jnp.float32)
        in_x = ((cols[None, None, :] >= x_min[:, None, None])
                & (cols[None, None, :] < x_max[:, None, None]))
        in_y = ((rows[None, :, None] >= y_min[:, None, None])
                & (rows[None, :, None] < y_max[:, None, None]))
        return (in_x & in_y).astype(jnp.float32)

    def _build_keypoint_decoder(self):
        cfg = self.cfg
        hw = cfg.image_size

        if cfg.task == "face":
            from ..data.rasterize_jax import rasterize_face_clip

            def fn(params, src_pack, keypoints, bw):
                lbl_cls = rasterize_face_clip(keypoints, bw, h=hw, w=hw)
                onehot = jax.nn.one_hot(lbl_cls, cfg.label_nc)
                bbox = self._extent_bbox(keypoints[..., 0],
                                         keypoints[..., 1], hw)
                return decode_with_sources(self.mods, params, src_pack,
                                           onehot, bbox)
        else:
            from ..data.rasterize_jax import rasterize_pose_clip

            def fn(params, src_pack, keypoints, bw):
                # keypoints: concatenated (F, 137, 2) pose|face|hand_l|hand_r
                pose = keypoints[:, :25]
                face = keypoints[:, 25:95]
                hand_l = keypoints[:, 95:116]
                hand_r = keypoints[:, 116:137]
                lbl_cls = rasterize_pose_clip(
                    pose, face, hand_l, hand_r, bw,
                    jnp.maximum(bw / 3.0, 1.0), h=hw, w=hw)
                onehot = jax.nn.one_hot(lbl_cls, cfg.label_nc)
                valid = jnp.all(keypoints != 0, axis=-1)
                xs = jnp.where(valid, keypoints[..., 0], jnp.inf)
                ys = jnp.where(valid, keypoints[..., 1], jnp.inf)
                xs_max = jnp.where(valid, keypoints[..., 0], -jnp.inf)
                ys_max = jnp.where(valid, keypoints[..., 1], -jnp.inf)
                bbox = self._extent_bbox(
                    jnp.stack([jnp.min(xs, 1), jnp.max(xs_max, 1)], 1),
                    jnp.stack([jnp.min(ys, 1), jnp.max(ys_max, 1)], 1), hw)
                return decode_with_sources(self.mods, params, src_pack,
                                           onehot, bbox)

        return jax.jit(fn)

    def push_keypoints(self, keypoints, bw: Optional[np.ndarray] = None
                       ) -> np.ndarray:
        """Crop-local keypoints -> (F, H, W, 3), fully on device.

        Face task: (F, 68, 2) landmarks. Pose task: (F, 137, 2)
        concatenated [pose 25 | face 70 | hand_l 21 | hand_r 21]
        validated keypoints (zeros = undetected).
        """
        if self._decode_kp is None:
            self._decode_kp = self._build_keypoint_decoder()
        keypoints = jnp.asarray(keypoints, jnp.float32)
        f = keypoints.shape[0]
        if bw is None:
            bw = jnp.ones((f,), jnp.float32)
        outs = []
        for lo in range(0, f, self.chunk):
            idx = np.arange(lo, lo + self.chunk) % f
            rec = self._decode_kp(self.params, self.src_pack,
                                  keypoints[idx], jnp.asarray(bw)[idx])
            outs.append(np.asarray(rec[: min(self.chunk, f - lo)]))
        return np.concatenate(outs, axis=0)
