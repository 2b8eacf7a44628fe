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
                 chunk: int = 32, use_pallas: bool = True,
                 pipeline_depth: int = 4, output: str = "model"):
        """Args are NHWC device-ready arrays: src_img (S, H, W, 3) in
        model space, src_lbl (S, H, W, L) one-hot, src_bbox (S, H, W).

        `pipeline_depth`: chunks kept in flight before the oldest result
        is fetched (0 = the old serialized dispatch). Depth 4 bounds the
        extra result memory at 4 chunk outputs (~6 MB at chunk=8, 256²)
        while hiding the per-dispatch tunnel latency.

        `output`: wire format of the frames returned to the host.
        "model" (default) = f32 model-space frames, the raw network
        output. "display" = the display conversion the serving layer
        would do anyway (`round(clip(rec*255 + img_mean))`) runs ON
        DEVICE and frames cross the host boundary as (F, H, W, 3) uint8
        in the model's BGR channel order — 4x less tunnel traffic, which
        is the binding resource on serving-sized chunks (the round-5
        serve bench measured the f32 path flat at ~20-25 fps across
        chunk sizes: download-bandwidth-bound, not compute-bound)."""
        if output not in ("model", "display"):
            raise ValueError(f"unknown output format: {output!r}")
        self.cfg = cfg
        self.mods = TSNetModules(cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        self.chunk = chunk
        self.pipeline_depth = pipeline_depth
        self.output = output
        mean = jnp.asarray(cfg.img_mean_array(), jnp.float32)

        def finish(rec):
            if output == "display":
                return jnp.clip(jnp.round(rec * 255.0 + mean),
                                0.0, 255.0).astype(jnp.uint8)
            return rec

        self._finish = finish
        self._encode = jax.jit(functools.partial(encode_sources, self.mods))
        raw_decode = functools.partial(decode_with_sources, self.mods,
                                       use_pallas=use_pallas)

        def decode(params, src_pack, tar_lbl, tar_bbox):
            # class-map uint8 labels expand to one-hot on device; bbox
            # uploads in any dtype and casts here (uint8 on the wire)
            if tar_lbl.ndim == 3:
                tar_lbl = jax.nn.one_hot(tar_lbl, cfg.label_nc,
                                         dtype=jnp.float32)
            return finish(raw_decode(params, src_pack,
                                     tar_lbl.astype(jnp.float32),
                                     tar_bbox.astype(jnp.float32)))

        self._decode = jax.jit(decode)
        self.src_pack = self._encode(self.params, jnp.asarray(src_img),
                                     jnp.asarray(src_lbl),
                                     jnp.asarray(src_bbox))
        self._decode_kp = None

    # ------------------------------------------------------------------
    def _drain(self, pending, outs, depth: int):
        """Fetch queued chunk results until ≤ `depth` remain in flight."""
        while len(pending) > depth:
            lo, keep, rec = pending.pop(0)
            outs.append(np.asarray(rec[:keep]))

    def _run_chunks(self, dispatch, f: int) -> np.ndarray:
        """Pipelined chunk loop: keep `pipeline_depth` chunks in flight so
        the per-dispatch host/tunnel latency overlaps device compute
        instead of serializing with it (the reference's per-frame loop,
        demo/demo_face.py:185-192, serializes EVERY frame; the round-4
        sweep measured the serialized chunk=8 path at 131 fps vs 546 at
        chunk=128 — dispatch latency, not compute). Results still return
        in order."""
        outs, pending = [], []
        for lo in range(0, f, self.chunk):
            idx = np.arange(lo, lo + self.chunk) % f
            rec = dispatch(idx)
            # start the device->host copy as soon as the chunk's compute
            # finishes instead of when its np.asarray comes due — D2H
            # rides the tunnel concurrently with later chunks' compute
            try:
                rec.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((lo, min(self.chunk, f - lo), rec))
            self._drain(pending, outs, self.pipeline_depth)
        self._drain(pending, outs, 0)
        return np.concatenate(outs, axis=0)

    def push_labels(self, tar_lbl, tar_bbox) -> np.ndarray:
        """Label maps + bboxes -> (F, H, W, 3) frames (`output` format).

        `tar_lbl` is either (F, H, W, L) one-hot float, or a (F, H, W)
        integer CLASS MAP — the class map uploads as uint8 (L*4x less
        wire traffic) and expands to one-hot on device. `tar_bbox`
        (F, H, W) may be uint8 0/1; it casts on device."""
        tar_lbl = jnp.asarray(tar_lbl)
        tar_bbox = jnp.asarray(tar_bbox)

        def dispatch(idx):
            return self._decode(self.params, self.src_pack, tar_lbl[idx],
                                tar_bbox[idx])

        return self._run_chunks(dispatch, int(tar_lbl.shape[0]))

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
                return self._finish(decode_with_sources(
                    self.mods, params, src_pack, onehot, bbox))
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
                return self._finish(decode_with_sources(
                    self.mods, params, src_pack, onehot, bbox))

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
        bw = jnp.asarray(bw)

        def dispatch(idx):
            return self._decode_kp(self.params, self.src_pack,
                                   keypoints[idx], bw[idx])

        return self._run_chunks(dispatch, f)
