"""PyTorch `.pth` checkpoint -> flax param-pytree conversion.

The reference saves flat dicts of per-subnet state_dicts
(reference train_face.py:350-358: {'example', 'img_enc', 'lbl_enc',
'dec', 'fuse_net', 'netD'[, 'netDF']}) whose keys are positional
Sequential indices. This module maps those positions to our named flax
modules so published checkpoints (and torch-random-init test oracles)
load directly. The parity tests in tests/test_nn_parity.py round-trip
random torch weights through these converters and compare outputs.

Torch Sequential layouts being decoded (see reference model/TSNet.py):
- Encoder  (TSNet.py:52-86):   model.1 = stem conv, model.{4+3i} = down
  conv i, model.{4+3*nd+j}.conv_block.{1,5} = resblock j convs.
- Decoder  (TSNet.py:128-160, return_fea=True): attribute `map_conv`,
  then model{j}.0.conv_block.{1,5} for blocks, model{nb+i}.2 for the
  upsample convs, model{nb+nd}.1 for the final 7x7 conv.
- FuseNet  (TSNet.py:177-193): model.0.conv_block.{1,5}, `conv`.
- NLayerDiscriminator (networks.py:542-606, getIntermFeat=True):
  model{n}.0 for the five stage convs.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch here."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_conv_kernel(w) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO kernel."""
    return _np(w).transpose(2, 3, 1, 0)


def _conv(sd: Mapping, key: str) -> dict:
    return {
        "kernel": convert_conv_kernel(sd[f"{key}.weight"]),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _resblock(sd: Mapping, key: str) -> dict:
    return {
        "conv1": _conv(sd, f"{key}.conv_block.1"),
        "conv2": _conv(sd, f"{key}.conv_block.5"),
    }


def encoder_params_from_torch(sd: Mapping, n_downsampling: int,
                              n_blocks: int) -> dict:
    params = {"conv_in": _conv(sd, "model.1")}
    for i in range(n_downsampling):
        params[f"down{i}"] = _conv(sd, f"model.{4 + 3 * i}")
    base = 4 + 3 * n_downsampling
    for j in range(n_blocks):
        params[f"block{j}"] = _resblock(sd, f"model.{base + j}")
    return params


def decoder_params_from_torch(sd: Mapping, n_downsampling: int,
                              n_blocks: int) -> dict:
    params = {"map_conv": _conv(sd, "map_conv")}
    for j in range(n_blocks):
        params[f"block{j}"] = _resblock(sd, f"model{j}.0")
    for i in range(n_downsampling):
        params[f"up{i}"] = _conv(sd, f"model{n_blocks + i}.2")
    params["conv_out"] = _conv(sd, f"model{n_blocks + n_downsampling}.1")
    return params


def fusenet_params_from_torch(sd: Mapping, n_blocks: int = 1) -> dict:
    params = {}
    for j in range(n_blocks):
        params[f"block{j}"] = _resblock(sd, f"model.{j}")
    params["conv"] = _conv(sd, "conv")
    return params


def discriminator_params_from_torch(sd: Mapping, n_layers: int = 3) -> dict:
    return {f"stage{n}": _conv(sd, f"model{n}.0")
            for n in range(n_layers + 2)}


def generator_params_from_checkpoint(ckpt: Mapping, cfg) -> dict:
    """Convert the four generator subnets of a reference checkpoint.

    `ckpt` is the torch-loaded flat dict; `cfg` a TSNetConfig. Returns a
    params pytree matching models.TSNetModules.
    """
    return {
        "img_enc": encoder_params_from_torch(
            ckpt["img_enc"], cfg.n_downsampling, cfg.enc_n_blocks),
        "lbl_enc": encoder_params_from_torch(
            ckpt["lbl_enc"], cfg.n_downsampling, 0),
        "dec": decoder_params_from_torch(
            ckpt["dec"], cfg.n_downsampling, cfg.dec_n_blocks),
        "fuse_net": fusenet_params_from_torch(ckpt["fuse_net"]),
    }


def load_reference_checkpoint(path: str, cfg, include_discriminators=False):
    """torch.load a reference .pth and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    params = generator_params_from_checkpoint(ckpt, cfg)
    if include_discriminators:
        if "netD" in ckpt:
            params["netD"] = discriminator_params_from_torch(ckpt["netD"])
        if "netDF" in ckpt:
            params["netDF"] = discriminator_params_from_torch(ckpt["netDF"])
    return params, int(ckpt.get("example", 0))
