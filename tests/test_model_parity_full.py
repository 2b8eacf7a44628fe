"""Full-scale parity: the SHIPPED 256^2 config vs a torch oracle.

The north-star budget is <=0.01 mean L1 vs reference checkpoint outputs
(BASELINE.json). The published Google-Drive checkpoints aren't available
offline, so this is the strongest executable form of that check: the
complete shipped architecture (256^2, 9 encoder blocks, 4 decoder
blocks, n_downsampling=3, feat 512x32x32) with shared random weights,
reference math in torch vs our jitted NHWC forward.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu import compat
from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules, tsnet_forward
from tests.test_model_parity import build_torch_oracle, torch_forward
from tests.test_nn_parity import nhwc

torch.manual_seed(99)
RNG = np.random.default_rng(99)


def test_full_scale_forward_parity():
    import dataclasses
    cfg = dataclasses.replace(face_config(), n_source=2)
    nets = build_torch_oracle(cfg)
    img_enc, lbl_enc, dec, fuse = nets

    bs, size, S = 1, cfg.image_size, cfg.n_source
    src_imgs = [RNG.random((bs, size, size, 3), dtype=np.float32) - 0.4
                for _ in range(S)]
    src_lbls = [RNG.integers(0, 2, (bs, size, size, cfg.label_nc))
                .astype(np.float32) for _ in range(S)]
    src_boxes = [RNG.integers(0, 2, (bs, size, size)).astype(np.float32)
                 for _ in range(S)]
    tar_lbl = RNG.integers(0, 2, (bs, size, size, cfg.label_nc)) \
        .astype(np.float32)
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

    diff = np.abs(np.asarray(out["rec_img"]) - nhwc(want))
    assert diff.mean() < 1e-3, f"mean L1 {diff.mean()} (budget 0.01)"
    assert diff.max() < 0.05, f"max {diff.max()}"
