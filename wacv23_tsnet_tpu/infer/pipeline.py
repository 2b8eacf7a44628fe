"""Clip-batched inference pipeline + output writers.

Replaces the reference demos' per-frame Python loop with whole-clip
jitted inference (BASELINE.json "full-video streaming inference"):
sources are encoded once, driving frames are processed in fixed-size
jit-friendly chunks, and the per-frame renormalization + montage logic
of demo/demo_face.py:185-236 is reproduced on the host side.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..configs import TSNetConfig
from ..data.codecs import labels_to_onehot
from ..models.tsnet import TSNetModules, tsnet_forward_clip


class ClipInference:
    """Whole-clip TS-Net inference with reference-demo output semantics."""

    def __init__(self, cfg: TSNetConfig, params, use_pallas: bool = True,
                 chunk: int = 32):
        self.cfg = cfg
        self.mods = TSNetModules(cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        self.chunk = chunk
        self._fn = jax.jit(functools.partial(
            tsnet_forward_clip, self.mods, use_pallas=use_pallas))

        def _renorm_fn(params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox):
            rec = tsnet_forward_clip(self.mods, params, src_img, src_lbl,
                                     src_bbox, tar_lbl, tar_bbox,
                                     use_pallas=use_pallas)
            # per-frame renorm to the first reference's statistics ON
            # DEVICE (reference demo/demo_face.py:178-198); torch-unbiased
            # std. Avoids shipping unnormalized frames to the host.
            ref = src_img[0]
            ref_mean = jnp.mean(ref, axis=(0, 1))
            ref_std = jnp.std(ref, axis=(0, 1), ddof=1)
            gen_mean = jnp.mean(rec, axis=(1, 2), keepdims=True)
            gen_std = jnp.std(rec, axis=(1, 2), keepdims=True, ddof=1)
            return (rec - gen_mean) / gen_std * ref_std + ref_mean

        self._renorm_fn = jax.jit(_renorm_fn)

    def prepare_sources(self, src_imgs, src_lbls, src_bboxes):
        """Stage (S,3,H,W) mean-subtracted images + class-map labels."""
        onehot = labels_to_onehot(src_lbls, self.cfg.task)
        return (
            jnp.asarray(np.transpose(src_imgs, (0, 2, 3, 1)),
                        jnp.float32) / 255.0,
            jnp.asarray(np.transpose(onehot, (0, 2, 3, 1)), jnp.float32),
            jnp.asarray(src_bboxes, jnp.float32),
        )

    def _run_chunks(self, fn, src_imgs, src_lbls, src_bboxes, tar_lbls,
                    tar_bboxes):
        src_img, src_lbl, src_bbox = self.prepare_sources(
            src_imgs, src_lbls, src_bboxes)
        onehot = labels_to_onehot(tar_lbls, self.cfg.task)
        tar_lbl = jnp.asarray(np.transpose(onehot, (0, 2, 3, 1)), jnp.float32)
        tar_bbox = jnp.asarray(tar_bboxes, jnp.float32)

        f = tar_lbl.shape[0]
        outs = []
        for lo in range(0, f, self.chunk):
            idx = np.arange(lo, lo + self.chunk) % f   # pad by wrapping
            rec = fn(self.params, src_img, src_lbl, src_bbox,
                     tar_lbl[idx], tar_bbox[idx])
            outs.append(np.asarray(rec[: min(self.chunk, f - lo)]))
        rec = np.concatenate(outs, axis=0)
        return rec.transpose(0, 3, 1, 2)

    def run(self, src_imgs, src_lbls, src_bboxes, tar_lbls, tar_bboxes):
        """Run the whole driving clip; returns (F, 3, H, W) model-space rec.

        Frames are processed in fixed `chunk`s (last chunk padded) so jit
        compiles exactly one program regardless of clip length.
        """
        return self._run_chunks(self._fn, src_imgs, src_lbls, src_bboxes,
                                tar_lbls, tar_bboxes)

    def run_renormalized(self, src_imgs, src_lbls, src_bboxes, tar_lbls,
                         tar_bboxes):
        """`run` + on-device per-frame renorm to the first reference's
        mean/std (reference demo/demo_face.py:178-198)."""
        return self._run_chunks(self._renorm_fn, src_imgs, src_lbls,
                                src_bboxes, tar_lbls, tar_bboxes)


def to_display_rgb(img_chw: np.ndarray, mean) -> np.ndarray:
    """Model-space (3,H,W) -> uint8 RGB (reference sample_img,
    demo/demo_face.py:95-106): add mean/255, clip to [0,1], scale,
    BGR->RGB."""
    img = img_chw.transpose(1, 2, 0) + np.asarray(mean, np.float32) / 255.0
    img = np.clip(img, 0.0, 1.0) * 255.0
    return img[:, :, ::-1].astype(np.uint8)


def montage_row(images: Sequence[np.ndarray]) -> Image.Image:
    """Paste equally-sized RGB arrays side by side."""
    h, w = images[0].shape[:2]
    out = Image.new("RGB", (w * len(images), h))
    for i, img in enumerate(images):
        out.paste(Image.fromarray(img), (w * i, 0))
    return out


def save_gif(path: str, frames: Sequence[np.ndarray],
             duration_ms: int = 100) -> None:
    import imageio
    imageio.mimsave(path, list(frames), duration=duration_ms / 1000.0)
