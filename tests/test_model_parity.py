"""Full-generator forward parity vs a torch oracle with shared weights.

Builds the complete TS-Net inference forward in torch (same math as
reference model/TSNet.py:309-407), randomizes its weights, converts them
through `compat`, and checks our jitted NHWC forward reproduces the
reconstruction to tight tolerance. This is the strongest parity oracle
available without the published Google-Drive checkpoints.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu import compat
from wacv23_tsnet_tpu.configs import TSNetConfig
from wacv23_tsnet_tpu.models import TSNetModules, tsnet_forward
from tests.test_nn_parity import (TResBlock, Wrap, coord_cat, nhwc,
                                  t_decoder, t_encoder, to_torch)

torch.manual_seed(7)
RNG = np.random.default_rng(7)

CFG = TSNetConfig(task="face", label_nc=2, image_size=32, ngf=8,
                  n_downsampling=2, enc_n_blocks=2, dec_n_blocks=1,
                  n_source=2)


def build_torch_oracle(cfg):
    in_ch = 3 + cfg.label_nc + 3  # +3 coord channels
    img_enc = t_encoder(in_ch, cfg.ngf, cfg.n_downsampling, cfg.enc_n_blocks)
    lbl_enc = t_encoder(cfg.label_nc + 3, cfg.ngf, cfg.n_downsampling, 0)
    dec = t_decoder(3, cfg.ngf, cfg.n_downsampling, cfg.dec_n_blocks)
    feat = cfg.feat_ch
    fuse = Wrap(model=tnn.Sequential(TResBlock(2 * feat)),
                conv=tnn.Conv2d(2 * feat, feat, 1))
    return img_enc.eval(), lbl_enc.eval(), dec.eval(), fuse.eval()


def torch_forward(cfg, nets, src_imgs, src_lbls, src_boxes, tar_lbl, tar_bbox):
    """The reference forward math (model/TSNet.py:309-407), is_train=False."""
    img_enc, lbl_enc, dec, fuse = nets
    n_source = len(src_imgs)
    src_feas = []
    for i in range(n_source):
        inp = np.concatenate([src_imgs[i], src_lbls[i]], axis=-1)
        src_feas.append(img_enc.model(to_torch(coord_cat(inp))))
    tar_fea = lbl_enc.model(to_torch(coord_cat(tar_lbl)))
    b, c, h, w = tar_fea.shape

    tar_n = F.normalize(tar_fea, p=2, dim=1).view(b, c, h * w).transpose(1, 2)
    tar_box = F.interpolate(torch.from_numpy(tar_bbox).unsqueeze(1),
                            (h, w), mode="nearest").view(b, 1, h * w).transpose(1, 2)
    h_range = torch.linspace(-1, 1, h)
    w_range = torch.linspace(-1, 1, w)
    grid = torch.stack(torch.meshgrid([h_range, w_range], indexing="ij"),
                       -1).flip(2).reshape(h * w, 2)

    warped = []
    for i in range(n_source):
        s_n = F.normalize(src_feas[i], p=2, dim=1).view(b, c, h * w)
        s_box = F.interpolate(torch.from_numpy(src_boxes[i]).unsqueeze(1),
                              (h, w), mode="nearest").view(b, 1, h * w)
        sim = torch.bmm(tar_n * tar_box, s_n * s_box) + \
            torch.bmm(tar_n * (1 - tar_box), s_n * (1 - s_box))
        attn = F.softmax(100.0 * sim, dim=2)
        flow = torch.matmul(attn, grid).view(b, h, w, 2)
        warped.append(F.grid_sample(src_feas[i], flow, align_corners=False))
    prop = torch.stack(warped, 1).mean(1)

    syn = torch.stack(
        [fuse.conv(fuse.model(torch.cat([f, tar_fea], 1)))
         for f in src_feas], 1).mean(1)

    res = dec.map_conv(torch.cat([prop, syn], 1))
    for n in range(cfg.dec_n_blocks + cfg.n_downsampling):
        res = getattr(dec, f"model{n}")(res)
    out = getattr(dec, f"model{cfg.dec_n_blocks + cfg.n_downsampling}")(res)
    return out


def test_full_forward_parity():
    cfg = CFG
    nets = build_torch_oracle(cfg)
    img_enc, lbl_enc, dec, fuse = nets

    bs, size, S = 2, cfg.image_size, cfg.n_source
    src_imgs = [RNG.random((bs, size, size, 3), dtype=np.float32) - 0.4
                for _ in range(S)]
    src_lbls = [RNG.integers(0, 2, (bs, size, size, cfg.label_nc))
                .astype(np.float32) for _ in range(S)]
    src_boxes = [RNG.integers(0, 2, (bs, size, size)).astype(np.float32)
                 for _ in range(S)]
    tar_lbl = RNG.integers(0, 2, (bs, size, size, cfg.label_nc)).astype(np.float32)
    tar_bbox = RNG.integers(0, 2, (bs, size, size)).astype(np.float32)

    with torch.no_grad():
        want = torch_forward(cfg, nets, src_imgs, src_lbls, src_boxes,
                             tar_lbl, tar_bbox)

    params = {
        "img_enc": compat.encoder_params_from_torch(
            img_enc.state_dict(), cfg.n_downsampling, cfg.enc_n_blocks),
        "lbl_enc": compat.encoder_params_from_torch(
            lbl_enc.state_dict(), cfg.n_downsampling, 0),
        "dec": compat.decoder_params_from_torch(
            dec.state_dict(), cfg.n_downsampling, cfg.dec_n_blocks),
        "fuse_net": compat.fusenet_params_from_torch(fuse.state_dict()),
    }
    mods = TSNetModules(cfg)
    out = jax.jit(
        lambda p, *a: tsnet_forward(mods, p, *a, train=False,
                                    use_pallas=False)
    )(params,
      jnp.asarray(np.stack(src_imgs, 1)), jnp.asarray(np.stack(src_lbls, 1)),
      jnp.asarray(np.stack(src_boxes, 1)), jnp.asarray(tar_lbl),
      jnp.asarray(tar_bbox))

    got = np.asarray(out["rec_img"])
    diff = np.abs(got - nhwc(want))
    assert diff.max() < 5e-3, f"max abs diff {diff.max()}"
    assert diff.mean() < 2e-4, f"mean abs diff {diff.mean()}"
