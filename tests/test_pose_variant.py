"""Pose-variant model: face-crop discriminator, fg-mask compositing,
crop_faces parity vs a torch oracle of the reference crop logic."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNet, crop_faces

RNG = np.random.default_rng(17)

# d_n_layers=2: at the toy 64^2 size the face crops are 16^2, where the
# full 3-layer PatchGAN's final 4x4 convs would shrink to an empty map
# (the shipped 256^2 config crops 64^2 faces and is unaffected)
POSE_TOY = dataclasses.replace(
    toy_config(), task="pose", label_nc=25, use_face_d=True,
    use_fg_mask=True, use_align_loss=False, d_n_layers=2)


def torch_get_face_bbox(real_lbl):
    """Reference get_face_bbox math (model/TSNet_pose.py:450-482)."""
    _, h, w = real_lbl.shape
    ylen = xlen = h // 32 * 8
    face_coord = (real_lbl[-1] > 0).nonzero()
    head_coord = ((real_lbl[1] + real_lbl[2] + real_lbl[3] + real_lbl[4])
                  > 0).nonzero()
    coord = face_coord if face_coord.size(0) else head_coord
    if coord.size(0):
        y, x = coord[:, 0], coord[:, 1]
        ys, ye = y.min().item(), y.max().item()
        xs, xe = x.min().item(), x.max().item()
        xc, yc = (xs + xe) // 2, (ys * 3 + ye * 2) // 5
        ylen = int((xe - xs) * 2.5)
        ylen = xlen = min(w, max(32, ylen))
        yc = max(ylen // 2, min(h - 1 - ylen // 2, yc))
        xc = max(xlen // 2, min(w - 1 - xlen // 2, xc))
    else:
        yc, xc = h // 4, w // 2
    return yc - ylen // 2, yc + ylen // 2, xc - xlen // 2, xc + xlen // 2


def test_crop_faces_matches_reference_logic():
    b, h, w, l = 2, 256, 256, 25
    imgs = RNG.random((b, h, w, 3), dtype=np.float32)
    lbls = np.zeros((b, h, w, l), np.float32)
    # sample 0: a face blob; sample 1: only head classes
    lbls[0, 60:100, 110:150, 24] = 1.0
    lbls[1, 40:80, 100:160, 2] = 1.0

    got = np.asarray(crop_faces(jnp.asarray(imgs), jnp.asarray(lbls)))
    face_size = h // 32 * 8
    assert got.shape == (b, face_size, face_size, 3)

    for i in range(b):
        lbl_chw = torch.from_numpy(lbls[i].transpose(2, 0, 1))
        ys, ye, xs, xe = torch_get_face_bbox(lbl_chw)
        img_chw = torch.from_numpy(imgs[i].transpose(2, 0, 1))[None]
        want = F.interpolate(img_chw[:, :, ys:ye, xs:xe],
                             size=(face_size, face_size), mode="bilinear",
                             align_corners=True)
        np.testing.assert_allclose(
            got[i], want[0].numpy().transpose(1, 2, 0), atol=1e-4)


def test_pose_toy_train_step():
    cfg = POSE_TOY
    bs, size = 2, cfg.image_size
    model = TSNet(cfg, is_train=True, use_pallas=False)
    srcs = [RNG.random((bs, 3, size, size), dtype=np.float32) * 255
            for _ in range(cfg.n_source)]
    lbls = []
    for _ in range(cfg.n_source):
        lbl = np.zeros((bs, cfg.label_nc, size, size), np.float32)
        lbl[:, 0] = 1.0
        lbl[:, 24, 10:20, 20:40] = 1.0   # face pixels
        lbl[:, 0, 10:20, 20:40] = 0.0
        lbls.append(lbl)
    boxes = [RNG.integers(0, 2, (bs, size, size)).astype(np.float32)
             for _ in range(cfg.n_source)]
    tar_img = RNG.random((bs, 3, size, size), dtype=np.float32) * 255

    model.setup(0, bs, 100, 1000, 1.0)
    model.set_train_input(srcs, lbls, boxes, tar_img, lbls[0], boxes[0])
    model.optimize_parameters()
    losses = model.get_current_losses()
    assert {"GF", "GF_GAN", "DF", "DF_real", "DF_fake"} <= set(losses)
    assert "align" not in losses
    for k, v in losses.items():
        assert np.isfinite(v), k

    # fg-mask compositing: background columns are the mean color
    rec = model.rec_tar_img
    bg = -cfg.img_mean_array() / 255.0
    np.testing.assert_allclose(
        rec[:, :, :, : size // 4],
        np.broadcast_to(bg.reshape(1, 3, 1, 1),
                        rec[:, :, :, : size // 4].shape), atol=1e-6)
