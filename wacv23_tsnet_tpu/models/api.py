"""Reference-compatible stateful TSNet API.

Mirrors the public surface of the reference `TSNet` class
(model/TSNet.py:203-512 / model/TSNet_pose.py): callers stage inputs
with `set_train_input`/`set_test_input`, call `forward()` or
`optimize_parameters()`, and read results back from attributes
(`rec_tar_img`, `warp_src_img_list`, `get_current_losses()`).

Inputs are numpy arrays in the reference's NCHW layout and value
conventions: images arrive mean-subtracted BGR and are divided by 255
here (reference TSNet.py:268,279); labels arrive one-hot (B, L, H, W);
bboxes (B, H, W). Internally everything is NHWC on device, and the
actual compute is the pure jitted functions of `models.tsnet` /
`train.step` — this class is a thin staging shim so reference-style
driver code ports line-for-line.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import TSNetConfig
from ..train.schedule import lr_poly
from ..train.state import create_train_state
from .tsnet import TSNetModules, tsnet_forward


def _nhwc(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 2, 3, 1)))


def _nchw(x) -> np.ndarray:
    return np.asarray(x).transpose(0, 3, 1, 2)


class TSNet:
    """Stateful TS-Net with the reference's method surface."""

    def __init__(self, cfg: Optional[TSNetConfig] = None, *, lr: float = 2e-4,
                 beta1: float = 0.5, is_train: bool = True,
                 lambda_dec: float = 1.0, seed: int = 0,
                 use_pallas: bool = True, vgg_params=None, **overrides):
        if cfg is None:
            cfg = TSNetConfig(**overrides)
        self.cfg = cfg
        self.lr = lr
        self.is_train = is_train
        self.lambda_dec = lambda_dec
        self.use_pallas = use_pallas
        self.mods = TSNetModules(cfg)
        self.n_source = cfg.n_source
        rng = jax.random.PRNGKey(seed)

        if is_train:
            if vgg_params is None:
                from ..nn import load_vgg19_params
                vgg_params = load_vgg19_params()
            self.state = create_train_state(self.mods, rng,
                                            vgg_params=vgg_params,
                                            beta1=beta1)
            # deferred: train.step imports models.tsnet, so a module-
            # level import here is circular when wacv23_tsnet_tpu.train
            # is imported before wacv23_tsnet_tpu.models
            from ..train.step import make_train_step
            self._train_step = make_train_step(
                self.mods, lambda_dec=lambda_dec, beta1=beta1,
                use_pallas=use_pallas)
        else:
            self.state = None
            self.gen_params = self.mods.init_generator_params(rng)

        self._infer_fns: dict = {}
        self._current_lr = lr
        self._batch = None
        self.loss_names = (
            ["G", "G_GAN", "G_FML", "G_VGG", "GF", "GF_GAN", "GF_FML",
             "GF_VGG", "D", "D_real", "D_fake", "DF", "DF_real", "DF_fake",
             "grad_G", "warp"]
            if cfg.use_face_d else
            ["G", "G_GAN", "G_FML", "G_VGG", "D", "D_real", "D_fake",
             "grad_G", "warp", "align"])
        self._losses = {k: 0.0 for k in self.loss_names}
        self._rec_dev = None
        self._rec_cache = None
        self._metrics_dev = None
        self.warp_src_img_list = None

    # ------------------------------------------------------------------
    # lazy device->host materialization: through this host's TPU tunnel a
    # full-frame pull costs ~1s, so results stay on device until read
    # ------------------------------------------------------------------
    @property
    def rec_tar_img(self):
        if self._rec_cache is None and self._rec_dev is not None:
            self._rec_cache = _nchw(self._rec_dev)
        return self._rec_cache

    def _set_rec(self, rec_device) -> None:
        self._rec_dev = rec_device
        self._rec_cache = None

    def _sync_losses(self) -> None:
        if self._metrics_dev is None:
            return
        metrics, self._metrics_dev = self._metrics_dev, None
        # one stacked transfer instead of len(metrics) scalar round-trips
        keys = list(metrics)
        values = np.asarray(jnp.stack([metrics[k] for k in keys]))
        for k, v in zip(keys, values):
            self._losses[k] = float(v)

    # ------------------------------------------------------------------
    # parameter access
    # ------------------------------------------------------------------
    @property
    def generator_params(self):
        return self.state.gen_params if self.state is not None else self.gen_params

    def load_generator_params(self, params) -> None:
        params = jax.tree.map(jnp.asarray, params)
        if self.state is not None:
            self.state = self.state.replace(gen_params=params)
        else:
            self.gen_params = params

    # ------------------------------------------------------------------
    # input staging (reference model/TSNet.py:266-294)
    # ------------------------------------------------------------------
    def set_train_input(self, src_img_list, src_lbl_list, src_bbox_list,
                        tar_img, tar_lbl, tar_bbox, use_prev=None) -> None:
        srcs = []
        for idx, img in enumerate(src_img_list):
            scaled = np.asarray(img, np.float32)
            if use_prev is None or not use_prev[idx]:
                scaled = scaled / 255.0
            srcs.append(_nhwc(scaled))
        self._batch = {
            "src_img": np.stack(srcs, axis=1),
            "src_lbl": np.stack([_nhwc(l) for l in src_lbl_list], axis=1),
            "src_bbox": np.stack(
                [np.asarray(b, np.float32) for b in src_bbox_list], axis=1),
            "tar_img": _nhwc(np.asarray(tar_img, np.float32) / 255.0),
            "tar_lbl": _nhwc(tar_lbl),
            "tar_bbox": np.asarray(tar_bbox, np.float32),
        }

    def set_test_input(self, src_img_list, src_lbl_list, src_bbox_list,
                       tar_lbl, tar_bbox, **_prev) -> None:
        self._batch = {
            "src_img": np.stack(
                [_nhwc(np.asarray(i, np.float32) / 255.0)
                 for i in src_img_list], axis=1),
            "src_lbl": np.stack([_nhwc(l) for l in src_lbl_list], axis=1),
            "src_bbox": np.stack(
                [np.asarray(b, np.float32) for b in src_bbox_list], axis=1),
            "tar_lbl": _nhwc(tar_lbl),
            "tar_bbox": np.asarray(tar_bbox, np.float32),
        }

    def set_source_num(self, n_source: int) -> None:
        self.n_source = n_source

    # ------------------------------------------------------------------
    # compute
    # ------------------------------------------------------------------
    def _infer_fn(self, n_source: int, train: bool):
        key = (n_source, train)
        if key not in self._infer_fns:
            mods, use_pallas = self.mods, self.use_pallas

            def fn(params, batch):
                return tsnet_forward(
                    mods, params, batch["src_img"], batch["src_lbl"],
                    batch["src_bbox"], batch["tar_lbl"], batch["tar_bbox"],
                    tar_img=batch.get("tar_img"), train=train,
                    use_pallas=use_pallas)

            self._infer_fns[key] = jax.jit(fn)
        return self._infer_fns[key]

    def forward(self) -> None:
        """Generator forward on the staged inputs (reference :309-407)."""
        batch = dict(self._batch)
        train = self.is_train and "tar_img" in batch
        out = self._infer_fn(batch["src_img"].shape[1], train)(
            self.generator_params, batch)
        self._set_rec(out["rec_img"])
        if train:
            warp = np.asarray(out["warp_imgs"])
            self.warp_src_img_list = [
                warp[:, i].transpose(0, 3, 1, 2)
                for i in range(warp.shape[1])]
            self._losses["warp"] = float(out["loss_warp"])
            if self.cfg.use_align_loss:
                self._losses["align"] = float(out["loss_align"])

    def optimize_parameters(self) -> None:
        """One full D-then-G GAN update (reference :432-460)."""
        assert self.is_train, "optimize_parameters requires is_train=True"
        self.state, metrics, rec = self._train_step(
            self.state, self._batch, jnp.float32(self._current_lr))
        self._set_rec(rec)
        self._metrics_dev = metrics
        self._sync_losses()

    def render_warp_previews(self, batch: dict) -> np.ndarray:
        """(B, S, 3, H, W) warp-supervision images for a device batch.

        The training step doesn't ship warp images back per step (big
        transfers); snapshot writers call this at imgshot frequency to
        reproduce the reference's warp-preview column
        (train_face.py:319-322)."""
        out = self._infer_fn(batch["src_img"].shape[1], True)(
            self.generator_params, batch)
        return np.asarray(out["warp_imgs"]).transpose(0, 1, 4, 2, 3)

    def optimize_parameters_on(self, batch: dict) -> None:
        """GAN update on a pre-staged NHWC device batch.

        Fast path for training loops: sources can be `jax.device_put`
        once per clip instead of re-transferring through
        `set_train_input` for every target frame. `batch` keys follow
        the pure train-step contract (src_img (B,S,H,W,3) model-space,
        src_lbl, src_bbox, tar_img, tar_lbl, tar_bbox).
        """
        assert self.is_train
        self.state, metrics, rec = self._train_step(
            self.state, batch, jnp.float32(self._current_lr))
        self._set_rec(rec)
        # metrics stay on device; get_current_losses() materializes them
        # in one stacked transfer when actually read
        self._metrics_dev = metrics

    # ------------------------------------------------------------------
    # schedule + reporting (reference :485-512)
    # ------------------------------------------------------------------
    def setup(self, actual_step: int, batch_size: int, initial_iter: int,
              max_iter: int, power: float) -> None:
        self._current_lr = float(lr_poly(self.lr, actual_step * batch_size,
                                         initial_iter, max_iter, power))

    def get_current_losses(self) -> "OrderedDict[str, float]":
        self._sync_losses()
        return OrderedDict((k, float(self._losses.get(k, 0.0)))
                           for k in self.loss_names)

    def print_learning_rate(self) -> None:
        lr = self._current_lr
        print("lr= %.7f, lr_dec=%.7f, lr_dis=%.7f"
              % (lr, self.lambda_dec * lr, 0.5 * lr))
